"""Gaussian parameter container: fixed capacity + alive mask (TPU-first).

The reference mutates tensor sizes on every densify/prune
(`scene/gaussian_model.py:258-407`), which would force an XLA recompile each
time.  Here the model lives in **fixed-capacity** buffers with a boolean
``alive`` mask: densify/clone/split/prune are masked scatter updates of
static-shape arrays (see ``models/densify.py``), so the train step compiles
once and the arrays shard cleanly over a `gauss` mesh axis.

Parameter semantics match the reference exactly
(`scene/gaussian_model.py:26-42,95-118`):

- ``scaling`` is stored in log-space, activated with exp;
- ``opacity`` is stored in logit-space, activated with sigmoid;
- ``rotation`` quaternions are normalized on use;
- SH features are split into DC ([C,1,3]) and rest ([C,K-1,3]) because they
  train with different learning rates.

Dead (non-alive) slots render with opacity 0 and receive zero gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from event3dgs_tpu.core.sh import rgb_to_sh
from event3dgs_tpu.core.transforms import inverse_sigmoid


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) parameters in fixed-capacity buffers."""

    xyz: jnp.ndarray  # [C, 3]
    features_dc: jnp.ndarray  # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray  # [C, 3] log-space
    rotation: jnp.ndarray  # [C, 4] quaternion (unnormalized)
    opacity: jnp.ndarray  # [C, 1] logit-space
    alive: jnp.ndarray  # [C] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_coeffs(self) -> int:
        return 1 + self.features_rest.shape[1]


class ActivatedGaussians(NamedTuple):
    """Activated parameters as consumed by the renderer."""

    means3d: jnp.ndarray  # [C, 3]
    features: jnp.ndarray  # [C, K, 3]
    opacities: jnp.ndarray  # [C] (zeroed for dead slots)
    scales: jnp.ndarray  # [C, 3]
    rotations: jnp.ndarray  # [C, 4]


def activated(params: GaussianParams) -> ActivatedGaussians:
    """Apply activations; dead slots get opacity 0 so they never render."""
    return ActivatedGaussians(
        means3d=params.xyz,
        features=jnp.concatenate([params.features_dc, params.features_rest], axis=1),
        opacities=jax.nn.sigmoid(params.opacity[:, 0]) * params.alive,
        scales=jnp.exp(params.scaling),
        rotations=params.rotation,
    )


def num_alive(params: GaussianParams) -> jnp.ndarray:
    return jnp.sum(params.alive)


# The six trainable leaves (the reference's six Adam param groups,
# `gaussian_model.py:154-161`); `alive` is bookkeeping, never optimized.
TRAINABLE_FIELDS = (
    "xyz",
    "features_dc",
    "features_rest",
    "scaling",
    "rotation",
    "opacity",
)


def trainable_dict(params: GaussianParams) -> dict:
    """Extract the trainable sub-pytree (excludes the alive mask)."""
    return {f: getattr(params, f) for f in TRAINABLE_FIELDS}


def with_trainable(params: GaussianParams, tree: dict) -> GaussianParams:
    """Rebuild GaussianParams from a trainable dict, keeping the alive mask."""
    return params.replace(**tree)


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors (host-side).

    TPU-native replacement for the reference's `simple-knn` CUDA extension
    (`scene/gaussian_model.py:20,134`): used once at init to set Gaussian
    scales, so a host KD-tree is the right tool (exactness matters, speed
    does not).
    """
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    if pts.shape[0] < 4:
        return np.full(pts.shape[0], 1e-4)
    tree = cKDTree(pts)
    # query includes the point itself at distance 0 → take neighbors 1..3
    dists, _ = tree.query(pts, k=4)
    return np.mean(dists[:, 1:] ** 2, axis=1)


def grow_params(params: GaussianParams, new_capacity: int) -> GaussianParams:
    """Grow the capacity buffers, preserving all live slots.

    The TPU equivalent of the reference's tensor reallocation on densify
    (`scene/gaussian_model.py:349-403` never drops candidates): when a
    densify step reports overflow, the host grows capacity (one re-jit) and
    re-runs it.  New slots are dead, with identity rotations (a zero
    quaternion would NaN `quat_to_rotmat`'s normalization) and the init
    opacity fill.
    """
    c = params.capacity
    if new_capacity <= c:
        raise ValueError(f"new capacity {new_capacity} <= current {c}")
    pad = new_capacity - c

    def zpad(leaf):
        return jnp.pad(leaf, [(0, pad)] + [(0, 0)] * (leaf.ndim - 1))

    rot_pad = jnp.zeros((pad, 4)).at[:, 0].set(1.0)
    opa_pad = jnp.full((pad, 1), float(inverse_sigmoid(0.1)), jnp.float32)
    return GaussianParams(
        xyz=zpad(params.xyz),
        features_dc=zpad(params.features_dc),
        features_rest=zpad(params.features_rest),
        scaling=zpad(params.scaling),
        rotation=jnp.concatenate([params.rotation, rot_pad], axis=0),
        opacity=jnp.concatenate([params.opacity, opa_pad], axis=0),
        alive=zpad(params.alive),
    )


def init_from_point_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
) -> GaussianParams:
    """Initialize Gaussians from an SfM point cloud.

    Matches reference `create_from_pcd` (`scene/gaussian_model.py:124-147`):
    DC features from RGB2SH of point colors, isotropic log-scales from the
    sqrt of the clamped 3-NN mean squared distance, identity rotations and
    opacity 0.1.  Points beyond ``capacity`` are dropped; spare slots are
    dead until densification claims them.
    """
    n = min(points.shape[0], capacity)
    k = (max_sh_degree + 1) ** 2

    dist2 = np.maximum(mean_sq_dist_3nn(points[:n]), 1e-7)
    log_scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def alloc(shape, fill=0.0):
        return np.full((capacity,) + shape, fill, np.float32)

    xyz = alloc((3,))
    xyz[:n] = points[:n]
    f_dc = alloc((1, 3))
    f_dc[:n, 0] = rgb_to_sh(np.asarray(colors[:n], np.float32))
    f_rest = alloc((k - 1, 3))
    scaling = alloc((3,))
    scaling[:n] = log_scales
    rotation = alloc((4,))
    rotation[:, 0] = 1.0
    opacity = alloc((1,), fill=float(inverse_sigmoid(0.1)))
    alive = np.zeros(capacity, bool)
    alive[:n] = True

    return GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity),
        alive=jnp.asarray(alive),
    )
