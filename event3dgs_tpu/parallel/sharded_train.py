"""Sharded multi-view train step: shard_map over a (data × gauss) mesh.

The reference trains one view per iteration on one GPU
(`/root/reference/train.py:137-144`).  The TPU-native step batches ``B``
views per iteration and runs under ``jax.shard_map`` on a
``("data", "gauss")`` mesh:

- **data axis**: the view batch shards one view-group per rank; per-view
  losses and parameter gradients are explicitly psum'd across ``data``.
- **gauss axis**: Gaussian storage (params, Adam moments, densify stats)
  shards its capacity dimension.  Each shard projects, bins and rasterizes
  *only its own* Gaussians into (rgb, log T) partials with the production
  tiled Pallas rasterizer — which therefore sees ordinary local shapes, no
  GSPMD partitioning of the kernel — and shards merge in depth order via
  ``parallel.compose.merge_depth_partials``.  Per-device memory is
  O(N/K), never O(N): nothing ever all-gathers the parameter set.

Why shard_map and not GSPMD sharding annotations: the rasterizer is a
Pallas kernel with scalar-prefetch grids; under shard_map it runs unchanged
per device, and the only collectives are the two image-sized merges (an
all-gather of [H, W] logT maps and a psum of [H, W, 3] weighted partials)
plus the gradient psums over ``data`` — all explicit, all on ICI.

Gradient correctness across the merge (own shard's logT enters *other*
shards' transmittance prefixes) is delegated to JAX AD through the
collectives and pinned by the sharded-vs-single-device parity tests in
``tests/test_parallel.py``.

Densification stats under batching: the reference accumulates one view's
screen-gradient norm per iteration (`/root/reference/train.py:317-320`).
With ``B`` views per step this accumulates **per view** — ``Σ_v ‖g_v‖`` into
``grad_accum`` and ``Σ_v vis_v`` into ``denom`` — so ``grad_accum/denom``
keeps the reference's per-view-average semantics and the densify threshold
(2e-4) transfers unchanged.  Per-view gradients are rescaled by ``B`` to
undo the batch-mean normalization of the loss.
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
from event3dgs_tpu.models.densify import DensifyStats
from event3dgs_tpu.models.gaussians import (
    activated,
    trainable_dict,
    with_trainable,
)
from event3dgs_tpu.models.optimizer import adam_update
from event3dgs_tpu.ops.render import render_partials
from event3dgs_tpu.parallel.compose import merge_depth_partials
from event3dgs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS
from event3dgs_tpu.train.state import (
    SceneData,
    TrainState,
    active_sh_degree,
    sh_coeff_mask,
)
from event3dgs_tpu.train.step import _lr_tree
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig


def _is_capacity_leaf(leaf, gauss_size: int) -> bool:
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] >= gauss_size
        and leaf.shape[0] % gauss_size == 0
    )


def state_partition_specs(state: TrainState, mesh: Mesh):
    """Per-leaf PartitionSpec tree: capacity dims over ``gauss``, rest
    replicated."""
    gauss = mesh.shape[GAUSS_AXIS]
    return jax.tree.map(
        lambda leaf: P(GAUSS_AXIS) if _is_capacity_leaf(leaf, gauss) else P(),
        state,
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state with Gaussian storage sharded over ``gauss``.

    Every per-Gaussian leaf (params, Adam moments, densify stats) shards its
    capacity dimension; scalars replicate.  Works on multi-host meshes too:
    every process must hold the identical full-value state (true after init
    or a densify round-trip), and each contributes its addressable shards.
    """
    import numpy as np

    specs = state_partition_specs(state, mesh)
    multihost = jax.process_count() > 1

    def place(leaf, spec):
        sharding = NamedSharding(mesh, spec)
        if multihost:
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, state, specs)


def unshard_state(state: TrainState) -> TrainState:
    """Pull a (possibly sharded) train state into host-backed arrays.

    Used at densification boundaries: densify/prune runs globally (exact
    reference semantics) and the result is depth-repartitioned
    (``parallel.partition``) before re-placing with
    :func:`shard_train_state`.
    """
    return jax.tree.map(jnp.asarray, jax.device_get(state))


def make_sharded_train_step(
    mode: str,
    opt_cfg: OptimizationConfig,
    event_cfg: EventConfig,
    mesh: Mesh,
    max_sh_degree: int = 3,
    spatial_lr_scale: float = 1.0,
    rasterizer: str = "tiled",
    instance_cap: int | None = None,
) -> Callable:
    """Build the compiled batched/sharded train step.

    Signature: ``(state, data, idx_main [B], idx_now [B], idx_next [B], bg)
    → (state, metrics)`` with B a multiple of the ``data`` axis size.
    The state must be depth-partitioned over ``gauss``
    (``parallel.partition.repartition_by_depth``) for the cross-shard
    compositing order to be exact.
    """
    lambda_dssim = (
        event_cfg.event_lambda_dssim if mode.startswith("event")
        else opt_cfg.lambda_dssim
    )
    data_size = mesh.shape[DATA_AXIS]
    gauss_size = mesh.shape[GAUSS_AXIS]

    def body(state, data, idx_main, idx_now, idx_next, bg):
        # Local view: params/opt/stats are this rank's gauss shard
        # [C/gauss, ...]; idx arrays are this rank's views [B_local].
        b_local = idx_main.shape[0]
        b_global = b_local * data_size
        # state.step counts REFERENCE iterations (= views consumed), so the
        # lr/SH schedules calibrated on the reference's one-view loop
        # transfer unchanged; one batched step = B reference iterations.
        step = state.step + b_global
        deg = active_sh_degree(step, max_sh_degree)
        cmask = sh_coeff_mask(deg, (max_sh_degree + 1) ** 2)
        cap_local = state.params.xyz.shape[0]

        def render_p(act, features, cam, tap):
            return render_partials(
                act.means3d,
                features,
                act.opacities,
                act.scales,
                act.rotations,
                cam,
                sh_degree=max_sh_degree,
                mean2d_tap=tap,
                rasterizer=rasterizer,
                instance_cap=instance_cap,
            )

        def merge(p):
            return merge_depth_partials(
                p.rgb, p.logt, bg, GAUSS_AXIS, gauss_size
            )

        def view_loss(act, features, contrast, tap, im, inow, inext):
            cam_main = jax.tree.map(lambda x: x[im], data.cameras)
            pm = render_p(act, features, cam_main, tap)
            img_main = merge(pm)
            gt_main = data.images[im]
            if mode == "rgb":
                loss, _ = rgb_total_loss(img_main, gt_main, lambda_dssim)
            elif mode == "gray":
                loss, _ = gray_total_loss(img_main, gt_main, lambda_dssim)
            else:
                cam_now = jax.tree.map(lambda x: x[inow], data.event_cameras)
                cam_next = jax.tree.map(lambda x: x[inext], data.event_cameras)
                img_now = merge(render_p(act, features, cam_now, None))
                img_next = merge(render_p(act, features, cam_next, None))
                loss, _ = event_total_loss(
                    img_now,
                    img_next,
                    img_main,
                    data.event_images[inow],
                    data.event_images[inext],
                    gt_main,
                    contrast,
                    gt_contrast=event_cfg.gt_contrast,
                    event_weight=event_cfg.event_weight,
                )
                if mode == "event_deblur":
                    loss, _ = deblur_mix(
                        loss, img_main, data.blurry_images[im],
                        event_cfg.blur_alpha,
                    )
            return loss, (pm.radii, pm.visibility)

        def loss_fn(train_tree, contrast, taps):
            params = with_trainable(state.params, train_tree)
            act = activated(params)
            features = act.features * cmask[None, :, None]
            total = jnp.zeros(())
            radii_l, vis_l = [], []
            for v in range(b_local):  # static unroll over local views
                lv, (radii, vis) = view_loss(
                    act, features, contrast, taps[v],
                    idx_main[v], idx_now[v], idx_next[v],
                )
                total = total + lv
                radii_l.append(radii)
                vis_l.append(vis)
            return total / b_global, (jnp.stack(radii_l), jnp.stack(vis_l))

        taps = jnp.zeros((b_local, cap_local, 2))
        train_tree = trainable_dict(state.params)
        (loss, (radii, vis)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(train_tree, state.contrast, taps)
        g_params, g_contrast, g_taps = grads

        # cross-view-rank gradient reduction (loss already carries 1/B)
        g_params = jax.tree.map(
            lambda g: jax.lax.psum(g, DATA_AXIS), g_params
        )
        g_contrast = jax.lax.psum(g_contrast, DATA_AXIS)

        lrs = _lr_tree(opt_cfg, step, spatial_lr_scale)
        new_tree, new_opt = adam_update(
            train_tree, g_params, state.opt_state, lrs
        )
        new_params = with_trainable(state.params, new_tree)

        if mode.startswith("event"):
            new_contrast, new_copt = adam_update(
                state.contrast, g_contrast, state.contrast_opt,
                event_cfg.contrast_lr,
            )
        else:
            new_contrast, new_copt = state.contrast, state.contrast_opt

        # densify stats: per-view accumulation (B reference iterations'
        # worth per step); ×B undoes the loss's batch-mean normalization
        vis_f = vis.astype(jnp.float32)  # [B_local, C/gauss]
        gnorm = jnp.linalg.norm(g_taps, axis=-1) * b_global
        acc = jax.lax.psum(jnp.sum(gnorm * vis_f, axis=0), DATA_AXIS)
        den = jax.lax.psum(jnp.sum(vis_f, axis=0), DATA_AXIS)
        rmax = jax.lax.pmax(jnp.max(radii * vis_f, axis=0), DATA_AXIS)
        new_stats = DensifyStats(
            grad_accum=state.stats.grad_accum + acc,
            denom=state.stats.denom + den,
            max_radii2d=jnp.maximum(state.stats.max_radii2d, rmax),
        )

        any_vis = jax.lax.pmax(
            jnp.any(vis, axis=0).astype(jnp.int32), DATA_AXIS
        )
        metrics = {
            "loss": jax.lax.psum(loss, DATA_AXIS),
            "contrast": new_contrast,
            "num_visible": jax.lax.psum(jnp.sum(any_vis), GAUSS_AXIS),
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

    # The shard_map in/out specs depend on the state's leaf shapes, so the
    # transformed step is built lazily per capacity and cached — capacity
    # growth rebuilds, everything else reuses the compiled step.
    #
    # Trace/lower split: tracing runs with shard_map's vma checking ON
    # (required — it drives the collective-transpose rules that make the
    # cross-shard compositing gradients exact; with it off, psum transposes
    # K-fold overcount), but LOWERING runs with the check off: the Pallas
    # interpret lowering replays index-map jaxprs against vma-typed scalar
    # operands, which the replay machinery cannot type-check (the jaxprs
    # were traced against un-annotated SMEM refs).  The jaxpr is final
    # before lowering, so this changes no semantics.
    cache: dict = {}

    def step(state, data: SceneData, idx_main, idx_now, idx_next, bg):
        from jax._src import config as _jax_config

        key = state.params.capacity
        if key not in cache:
            state_specs = state_partition_specs(state, mesh)
            data_specs = jax.tree.map(lambda _: P(), data)
            metric_specs = {"loss": P(), "contrast": P(), "num_visible": P()}
            mapped = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    state_specs, data_specs, P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS), P(),
                ),
                out_specs=(state_specs, metric_specs),
            )
            traced = jax.jit(mapped).trace(
                state, data, idx_main, idx_now, idx_next, bg
            )
            with _jax_config._check_vma(False):
                cache[key] = traced.lower().compile()
        return cache[key](state, data, idx_main, idx_now, idx_next, bg)

    return step
