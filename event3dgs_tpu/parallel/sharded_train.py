"""Sharded multi-view train step: dp over views × gauss-sharded parameters.

The reference trains one view per iteration on one GPU (`train.py:137-144`).
The TPU-native step batches ``B`` views per iteration (``B`` = size of the
``data`` mesh axis), shards the view batch over ``data`` and the Gaussian
storage over ``gauss``, and lets GSPMD insert the collectives:

- parameters are all-gathered across ``gauss`` for rendering (the gather's
  transpose becomes the gradient reduce-scatter back to the owner shard);
- per-view losses/grads are psum'd across ``data``;
- the Adam update runs shard-local on each device's parameter slice.

Event mode renders 3 views per element (main + consecutive pair), so one
batched step covers 3·B rasterizations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from event3dgs_tpu.losses.modes import (
    deblur_mix,
    event_total_loss,
    gray_total_loss,
    rgb_total_loss,
)
from event3dgs_tpu.models.densify import update_stats
from event3dgs_tpu.models.gaussians import (
    activated,
    trainable_dict,
    with_trainable,
)
from event3dgs_tpu.models.optimizer import adam_update
from event3dgs_tpu.ops import render
from event3dgs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS
from event3dgs_tpu.train.state import (
    SceneData,
    TrainState,
    active_sh_degree,
    sh_coeff_mask,
)
from event3dgs_tpu.train.step import _lr_tree
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state with Gaussian storage sharded over ``gauss``.

    Every per-Gaussian leaf (params, Adam moments, densify stats) shards its
    capacity dimension; scalars replicate.
    """
    gauss = NamedSharding(mesh, P(GAUSS_AXIS))
    rep = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] >= mesh.shape[GAUSS_AXIS]:
            return jax.device_put(leaf, gauss)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, state)


def make_sharded_train_step(
    mode: str,
    opt_cfg: OptimizationConfig,
    event_cfg: EventConfig,
    mesh: Mesh,
    max_sh_degree: int = 3,
    spatial_lr_scale: float = 1.0,
    rasterizer: str = "reference",
) -> Callable:
    """Build the compiled batched/sharded train step.

    Signature: ``(state, data, idx_main [B], idx_now [B], idx_next [B], bg)
    → (state, metrics)`` with B a multiple of the ``data`` axis size.
    """
    lambda_dssim = (
        event_cfg.event_lambda_dssim if mode.startswith("event")
        else opt_cfg.lambda_dssim
    )
    gauss_spec = NamedSharding(mesh, P(GAUSS_AXIS))
    data_spec = NamedSharding(mesh, P(DATA_AXIS))

    def pin_gauss(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, gauss_spec)
            if hasattr(x, "ndim") and x.ndim >= 1
            else x,
            tree,
        )

    @jax.jit
    def train_step(
        state: TrainState,
        data: SceneData,
        idx_main: jnp.ndarray,  # [B]
        idx_now: jnp.ndarray,  # [B]
        idx_next: jnp.ndarray,  # [B]
        bg: jnp.ndarray,
    ):
        step = state.step + 1
        deg = active_sh_degree(step, max_sh_degree)
        cmask = sh_coeff_mask(deg, (max_sh_degree + 1) ** 2)

        idx_main_s = jax.lax.with_sharding_constraint(idx_main, data_spec)

        def render_view(act, features, cam, tap):
            return render(
                act.means3d,
                features,
                act.opacities,
                act.scales,
                act.rotations,
                cam,
                bg,
                sh_degree=max_sh_degree,
                mean2d_tap=tap,
                rasterizer=rasterizer,
            )

        def per_view_loss(act, features, contrast, tap, im, inow, inext):
            cam_main = jax.tree.map(lambda x: x[im], data.cameras)
            out_main = render_view(act, features, cam_main, tap)
            gt_main = data.images[im]
            if mode == "rgb":
                loss, aux = rgb_total_loss(out_main.image, gt_main, lambda_dssim)
            elif mode == "gray":
                loss, aux = gray_total_loss(out_main.image, gt_main, lambda_dssim)
            else:
                cam_now = jax.tree.map(lambda x: x[inow], data.event_cameras)
                cam_next = jax.tree.map(lambda x: x[inext], data.event_cameras)
                out_now = render_view(act, features, cam_now, None)
                out_next = render_view(act, features, cam_next, None)
                loss, aux = event_total_loss(
                    out_now.image,
                    out_next.image,
                    out_main.image,
                    data.event_images[inow],
                    data.event_images[inext],
                    gt_main,
                    contrast,
                    gt_contrast=event_cfg.gt_contrast,
                    event_weight=event_cfg.event_weight,
                )
                if mode == "event_deblur":
                    loss, blur_aux = deblur_mix(
                        loss, out_main.image, data.blurry_images[im],
                        event_cfg.blur_alpha,
                    )
                    aux.update(blur_aux)
            return loss, (out_main.radii, out_main.visibility)

        def loss_fn(train_tree, contrast, taps):
            params = with_trainable(state.params, pin_gauss(train_tree))
            act = activated(params)
            features = act.features * cmask[None, :, None]
            losses, (radii, vis) = jax.vmap(
                per_view_loss, in_axes=(None, None, None, 0, 0, 0, 0)
            )(act, features, contrast, taps, idx_main_s, idx_now, idx_next)
            return jnp.mean(losses), (radii, vis)

        b = idx_main.shape[0]
        taps = jnp.zeros((b, state.params.capacity, 2))
        train_tree = trainable_dict(state.params)
        (loss, (radii, vis)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(train_tree, state.contrast, taps)
        g_params, g_contrast, g_taps = grads

        lrs = _lr_tree(opt_cfg, step, spatial_lr_scale)
        new_tree, new_opt = adam_update(
            pin_gauss(train_tree), pin_gauss(g_params), state.opt_state, lrs
        )
        new_params = with_trainable(state.params, new_tree)

        if mode.startswith("event"):
            new_contrast, new_copt = adam_update(
                state.contrast, g_contrast, state.contrast_opt,
                event_cfg.contrast_lr,
            )
        else:
            new_contrast, new_copt = state.contrast, state.contrast_opt

        # batched stats: accumulate every view's tap gradient (the
        # single-view reference accumulates one view per iteration)
        new_stats = state.stats
        new_stats = update_stats(
            new_stats,
            jnp.sum(g_taps, axis=0),
            jnp.max(radii, axis=0),
            jnp.any(vis, axis=0),
        )

        metrics = {
            "loss": loss,
            "contrast": new_contrast,
            "num_visible": jnp.sum(jnp.any(vis, axis=0)),
        }
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt,
            contrast=new_contrast,
            contrast_opt=new_copt,
            stats=new_stats,
            step=step,
        )
        return new_state, metrics

    return train_step
