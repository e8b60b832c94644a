"""The jitted train step: render → mode loss → grads → Adam → stats.

`make_train_step` closes over the static configuration (mode, optimizer
hyperparameters, background) and returns one compiled function

    (state, scene_data, idx_main, idx_now, idx_next, bg) → (state, metrics)

covering the reference's per-iteration work (`train.py:95-332`) minus
densification, which `make_densify_step` compiles separately (it runs every
`densification_interval` iterations, `train.py:316-327`).

Gradient taps: the loss is differentiated w.r.t. (trainable params, contrast
c, mean2d tap).  The tap is a zeros [C, 2] array added to the projected
screen-space means of the *main* view's render; its gradient is exactly the
quantity the reference reads from ``screenspace_points.grad`` for
densification stats (`train.py:319-320`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from event3dgs_tpu.core.schedules import exponential_lr
from event3dgs_tpu.losses.event import effective_contrast
from event3dgs_tpu.losses.modes import (
    deblur_mix,
    event_total_loss,
    gray_total_loss,
    rgb_total_loss,
)
from event3dgs_tpu.models.densify import (
    densify_and_prune,
    reset_opacity,
    update_stats,
)
from event3dgs_tpu.models.gaussians import (
    activated,
    trainable_dict,
    with_trainable,
)
from event3dgs_tpu.models.optimizer import adam_update
from event3dgs_tpu.ops import render
from event3dgs_tpu.train.state import (
    SceneData,
    TrainState,
    active_sh_degree,
    sh_coeff_mask,
)
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

MODES = ("rgb", "gray", "event", "event_deblur")


def _lr_tree(opt_cfg: OptimizationConfig, step, spatial_scale: float) -> dict:
    """Per-group learning rates (`gaussian_model.py:154-167`)."""
    xyz_lr = exponential_lr(
        step,
        opt_cfg.position_lr_init * spatial_scale,
        opt_cfg.position_lr_final * spatial_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    return {
        "xyz": xyz_lr,
        "features_dc": opt_cfg.feature_lr,
        "features_rest": opt_cfg.feature_lr / 20.0,
        "opacity": opt_cfg.opacity_lr,
        "scaling": opt_cfg.scaling_lr,
        "rotation": opt_cfg.rotation_lr,
    }


def make_train_step(
    mode: str,
    opt_cfg: OptimizationConfig,
    event_cfg: EventConfig,
    max_sh_degree: int = 3,
    spatial_lr_scale: float = 1.0,
    rasterizer: str = "reference",
    instance_cap: int | None = None,
) -> Callable:
    """Build the compiled train step for a training mode.

    ``instance_cap`` is the tiled rasterizer's static (tile, gaussian)
    instance budget; the training loop sizes it from measured counts and
    rebuilds the step (re-jit) when the scene outgrows it
    (`train/loop.py`).  None falls back to a generous heuristic.
    """
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")

    lambda_dssim = (
        event_cfg.event_lambda_dssim if mode.startswith("event")
        else opt_cfg.lambda_dssim
    )

    @jax.jit
    def train_step(
        state: TrainState,
        data: SceneData,
        idx_main: jnp.ndarray,
        idx_now: jnp.ndarray,
        idx_next: jnp.ndarray,
        bg: jnp.ndarray,
    ):
        step = state.step + 1  # reference iterations start at 1
        deg = active_sh_degree(step, max_sh_degree)
        cmask = sh_coeff_mask(deg, (max_sh_degree + 1) ** 2)

        cam_main = jax.tree.map(lambda x: x[idx_main], data.cameras)
        gt_main = data.images[idx_main]

        def render_view(act, features, cam, tap=None):
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
                instance_cap=instance_cap,
            )

        def loss_fn(train_tree, contrast, tap):
            params = with_trainable(state.params, train_tree)
            act = activated(params)
            features = act.features * cmask[None, :, None]
            out_main = render_view(act, features, cam_main, tap)

            if mode == "rgb":
                loss, aux = rgb_total_loss(out_main.image, gt_main, lambda_dssim)
            elif mode == "gray":
                loss, aux = gray_total_loss(out_main.image, gt_main, lambda_dssim)
            else:  # event / event_deblur
                cam_now = jax.tree.map(lambda x: x[idx_now], data.event_cameras)
                cam_next = jax.tree.map(lambda x: x[idx_next], data.event_cameras)
                out_now = render_view(act, features, cam_now)
                out_next = render_view(act, features, cam_next)
                loss, aux = event_total_loss(
                    out_now.image,
                    out_next.image,
                    out_main.image,
                    data.event_images[idx_now],
                    data.event_images[idx_next],
                    gt_main,
                    effective_contrast(
                        contrast, event_cfg.contrast_parameterization
                    ),
                    gt_contrast=event_cfg.gt_contrast,
                    event_weight=event_cfg.event_weight,
                )
                if mode == "event_deblur":
                    loss, blur_aux = deblur_mix(
                        loss,
                        out_main.image,
                        data.blurry_images[idx_main],
                        event_cfg.blur_alpha,
                    )
                    aux.update(blur_aux)
            aux["radii"] = out_main.radii
            aux["visibility"] = out_main.visibility
            return loss, aux

        tap = jnp.zeros((state.params.capacity, 2))
        train_tree = trainable_dict(state.params)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(train_tree, state.contrast, tap)
        g_params, g_contrast, g_tap = grads

        # parameter update
        lrs = _lr_tree(opt_cfg, step, spatial_lr_scale)
        new_tree, new_opt = adam_update(train_tree, g_params, state.opt_state, lrs)
        new_params = with_trainable(state.params, new_tree)

        # learnable contrast update (event modes only; `train.py:210-212`)
        if mode.startswith("event"):
            new_contrast, new_copt = adam_update(
                state.contrast, g_contrast, state.contrast_opt,
                event_cfg.contrast_lr,
            )
        else:
            new_contrast, new_copt = state.contrast, state.contrast_opt

        # densification statistics from the main view (`train.py:317-320`);
        # the (0.5W, 0.5H) scale matches the reference CUDA backward's
        # NDC-Jacobian pre-scaling (see update_stats)
        new_stats = update_stats(
            state.stats, g_tap, aux["radii"], aux["visibility"],
            grad_scale=(0.5 * cam_main.width, 0.5 * cam_main.height),
        )

        metrics = {
            "loss": loss,
            "l1": aux.get("l1", aux.get("event_l1", loss)),
            "contrast": effective_contrast(
                new_contrast, event_cfg.contrast_parameterization
            ),
            "contrast_raw": new_contrast,
            "num_visible": jnp.sum(aux["visibility"]),
        }
        for k in ("event_l1", "intensity_l1", "coverage", "blur_l1"):
            if k in aux:
                metrics[k] = aux[k]

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


def make_densify_step(opt_cfg: OptimizationConfig, extent: float) -> Callable:
    """Compile the densify-and-prune maintenance step (`train.py:322-324`)."""

    @partial(jax.jit, static_argnames=("use_size_prune",))
    def densify_step(state: TrainState, rng: jax.Array, use_size_prune: bool):
        res = densify_and_prune(
            state.params,
            state.opt_state,
            state.stats,
            rng,
            grad_threshold=opt_cfg.densify_grad_threshold,
            min_opacity=0.005,
            extent=extent,
            max_screen_size=20.0 if use_size_prune else 0.0,
            percent_dense=opt_cfg.percent_dense,
        )
        return (
            state.replace(params=res.params, opt_state=res.opt_state, stats=res.stats),
            res.overflow,
        )

    return densify_step


@jax.jit
def opacity_reset_step(state: TrainState) -> TrainState:
    """`reset_opacity` every opacity_reset_interval (`train.py:326-327`)."""
    new_params, new_opt = reset_opacity(state.params, state.opt_state)
    return state.replace(params=new_params, opt_state=new_opt)
