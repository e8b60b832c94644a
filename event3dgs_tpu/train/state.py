"""Train state pytree and scene-data containers.

The full optimization state — Gaussian parameters, their Adam state, the
learnable event contrast ``c`` with *its* Adam state, densification stats and
the step counter — lives in one pytree that flows through the jitted train
step.  Unlike the reference (which forgets ``c`` on checkpoint,
`gaussian_model.py:61-75` + `train.py:71`), the contrast is part of the state
and is checkpointed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from event3dgs_tpu.core.camera import Camera
from event3dgs_tpu.models.densify import DensifyStats, init_stats
from event3dgs_tpu.models.gaussians import GaussianParams, trainable_dict
from event3dgs_tpu.models.optimizer import AdamState, adam_init


@struct.dataclass
class TrainState:
    params: GaussianParams
    opt_state: AdamState
    contrast: jnp.ndarray  # scalar learnable event contrast c
    contrast_opt: AdamState
    stats: DensifyStats
    step: jnp.ndarray  # int32 iteration counter
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)


class SceneData(NamedTuple):
    """Device-resident training data (one resolution per stack).

    The four camera stacks of the reference dataset contract
    (`scene/dataset_readers.py:134-227`): train images, event-timed frames,
    blurry captures, and held-out test renders.
    """

    cameras: Camera  # batched [V]
    images: jnp.ndarray  # [V, H, W, 3]
    event_cameras: Optional[Camera] = None  # batched [Ve]
    event_images: Optional[jnp.ndarray] = None  # [Ve, H, W, 3]
    blurry_images: Optional[jnp.ndarray] = None  # [V, H, W, 3]
    test_cameras: Optional[Camera] = None
    test_images: Optional[jnp.ndarray] = None

    @property
    def num_views(self) -> int:
        return self.images.shape[0]


def init_train_state(
    params: GaussianParams,
    spatial_lr_scale: float,
    contrast_init: float = 0.17,
    max_sh_degree: int = 3,
) -> TrainState:
    contrast = jnp.asarray(contrast_init, jnp.float32)
    return TrainState(
        params=params,
        opt_state=adam_init(trainable_dict(params)),
        contrast=contrast,
        contrast_opt=adam_init(contrast),
        stats=init_stats(params.capacity),
        step=jnp.zeros((), jnp.int32),
        spatial_lr_scale=float(spatial_lr_scale),
        max_sh_degree=max_sh_degree,
    )


def grow_state(state: TrainState, new_capacity: int) -> TrainState:
    """Grow every capacity-sized buffer of the train state (host-side).

    Parameters grow via ``models.gaussians.grow_params``; Adam moments and
    densify stats zero-pad (new slots are dead until densification claims
    them, which zeroes their moments anyway).  Compiled steps re-jit on the
    new shapes automatically — this is the rare event the fixed-capacity
    design budgets for (see ``models/gaussians.py`` module docs).
    """
    from event3dgs_tpu.models.gaussians import grow_params

    c = state.params.capacity
    pad = new_capacity - c

    def zpad_tree(tree):
        def z(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == c:
                return jnp.pad(leaf, [(0, pad)] + [(0, 0)] * (leaf.ndim - 1))
            return leaf

        return jax.tree.map(z, tree)

    return state.replace(
        params=grow_params(state.params, new_capacity),
        opt_state=zpad_tree(state.opt_state),
        stats=zpad_tree(state.stats),
    )


def active_sh_degree(step: jnp.ndarray, max_degree: int) -> jnp.ndarray:
    """SH degree grows by one every 1000 iterations (`train.py:99-100`)."""
    return jnp.minimum(step // 1000, max_degree)


def sh_coeff_mask(active_degree: jnp.ndarray, n_coeffs: int) -> jnp.ndarray:
    """[K] float mask of SH coefficients enabled at ``active_degree``.

    Multiplying features by this mask is equivalent to evaluating at the
    lower degree, but keeps the render shape/compile static while the degree
    is a traced value — no recompiles at the 1000-iteration bumps.
    """
    idx = jnp.arange(n_coeffs)
    return (idx < (active_degree + 1) ** 2).astype(jnp.float32)


def nerfpp_extent(cameras: Camera) -> float:
    """Scene radius: 1.1 × max camera distance from the camera centroid
    (reference `getNerfppNorm`, `scene/dataset_readers.py:47-68`)."""
    centers = np.asarray(cameras.camera_center)
    center = centers.mean(axis=0, keepdims=True)
    return float(np.max(np.linalg.norm(centers - center, axis=1)) * 1.1)
