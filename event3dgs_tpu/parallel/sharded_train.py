"""Sharded multi-view train step: shard_map over a (data × gauss) mesh.

The reference trains one view per iteration on one GPU
(`/root/reference/train.py:137-144`).  The TPU-native step batches views
per iteration and runs under ``jax.shard_map`` on a ``("data", "gauss")``
mesh:

- **data axis**: the view batch shards one view-group per rank; per-view
  losses and parameter gradients are explicitly psum'd across ``data``.
- **gauss axis**: Gaussian storage (params, Adam moments, densify stats)
  shards its capacity dimension.  Parameters are never all-gathered —
  per-device *state* is O(N/K).

Two compositing strategies for the ``gauss`` axis (``gauss_mode``):

- ``"exact"`` (default): per view, shards exchange *projected splats*
  (one all_to_all of [K, C/K, 11] raster inputs per camera —
  ``parallel.exchange``) and each device rasterizes the full splat set for
  its own view with the global per-view (tile, depth) sort.  Exact parity
  with the single-device renderer on any geometry, orbit rigs included,
  and the gauss axis renders K extra views per step (D·K views/step).
  Per-device activation cost: one [C, 11] f32 splat buffer per live
  camera; comm O(11·C) per camera, resolution-independent.
- ``"partials"``: each shard rasterizes only its own Gaussians into
  (rgb, log T) image partials merged by per-view shard depth rank
  (``parallel.compose``).  Comm is O(K·H·W) images — cheaper than the
  exchange when C ≫ K·H·W — but the merge is **approximate**: shards of
  any static partition interleave in depth along rays, so cross-shard
  pairs with overlapping footprints can composite out of order.  Error is
  small on depth-separable rigs (forward-facing / layered scenes) and
  measurable on full orbits; see ``tests/test_parallel.py`` for measured
  bounds.  Use for forward-facing captures or when the image merge is the
  cheaper collective and the error bound is acceptable.

Why shard_map and not GSPMD sharding annotations: the rasterizer is a
Pallas kernel with scalar-prefetch grids; under shard_map it runs unchanged
per device, and the only collectives are the explicit exchanges above plus
the gradient psums over ``data`` — all on ICI.

Gradient correctness across the collectives (all_to_all transposes to the
reverse all_to_all, all_gather to psum_scatter; partials mode: own logT
enters other shards' transmittance prefixes) is delegated to JAX AD and
pinned by the sharded-vs-single-device parity tests in
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

from event3dgs_tpu.losses.event import effective_contrast
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
from event3dgs_tpu.parallel.compose import merge_depth_partials, view_depth_ranks
from event3dgs_tpu.parallel.exchange import render_view_exchange
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
    """Pull a (possibly sharded) train state into host-backed full arrays.

    Used at densification boundaries: densify/prune runs globally (exact
    reference semantics) and the result is re-placed with
    :func:`shard_train_state`.

    Multi-host: gauss-sharded leaves span non-addressable devices, so a
    plain ``device_get`` would raise; ``process_allgather`` assembles the
    full value on every process instead (each leaf is already identical
    across processes for replicated leaves, and the gather reconstructs
    sharded ones).
    """
    if jax.process_count() > 1:
        from jax.experimental.multihost_utils import process_allgather

        def pull(leaf):
            if not hasattr(leaf, "ndim"):
                return leaf
            if getattr(leaf, "is_fully_addressable", True):
                return jnp.asarray(jax.device_get(leaf))
            return jnp.asarray(process_allgather(leaf, tiled=True))

        return jax.tree.map(pull, state)
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
    gauss_mode: str = "exact",
) -> Callable:
    """Build the compiled batched/sharded train step.

    Signature: ``(state, data, idx_main [B], idx_now [B], idx_next [B], bg)
    → (state, metrics)``.  With ``gauss_mode="exact"`` (default) B must be
    a multiple of data·gauss (the view batch shards over both axes); with
    ``"partials"`` B is a multiple of the ``data`` size only and the state
    should be depth-partitioned over ``gauss``
    (``parallel.partition.repartition_by_depth``) to minimise the merge's
    ordering error.
    """
    if gauss_mode not in ("exact", "partials"):
        raise ValueError(f"gauss_mode must be 'exact' or 'partials', got {gauss_mode!r}")
    lambda_dssim = (
        event_cfg.event_lambda_dssim if mode.startswith("event")
        else opt_cfg.lambda_dssim
    )
    data_size = mesh.shape[DATA_AXIS]
    gauss_size = mesh.shape[GAUSS_AXIS]
    exact = gauss_mode == "exact"
    # exact mode: the gauss axis renders its own views, so one step consumes
    # b_local · data · gauss reference iterations; partials replicates views
    # across gauss.
    views_per_local = data_size * (gauss_size if exact else 1)

    def body(state, data, idx_main, idx_now, idx_next, bg):
        # Local view: params/opt/stats are this rank's gauss shard
        # [C/gauss, ...]; idx arrays are this rank's views [B_local].
        b_local = idx_main.shape[0]
        b_global = b_local * views_per_local
        # state.step counts REFERENCE iterations (= views consumed), so the
        # lr/SH schedules calibrated on the reference's one-view loop
        # transfer unchanged; one batched step = B reference iterations.
        step = state.step + b_global
        deg = active_sh_degree(step, max_sh_degree)
        cmask = sh_coeff_mask(deg, (max_sh_degree + 1) ** 2)
        cap_local = state.params.xyz.shape[0]

        # ---- exact gauss path: per-view projected-splat exchange ----------
        def exchange_render(act, features, cameras, vidx, tap):
            ex = render_view_exchange(
                act.means3d, features, act.opacities, act.scales,
                act.rotations, cameras, vidx, GAUSS_AXIS, gauss_size,
                max_sh_degree, taps=tap, rasterizer=rasterizer,
                instance_cap=instance_cap,
            )
            img = ex.rgb + jnp.exp(ex.logt)[:, :, None] * bg[None, None, :]
            return img, ex.radii_own, ex.vis_own

        # ---- partials gauss path: per-shard raster + rank-ordered merge ---
        def partials_render(act, features, cameras, vidx, tap):
            cam = jax.tree.map(lambda x: x[vidx], cameras)
            pm = render_partials(
                act.means3d, features, act.opacities, act.scales,
                act.rotations, cam, sh_degree=max_sh_degree,
                mean2d_tap=tap, rasterizer=rasterizer,
                instance_cap=instance_cap,
            )
            ranks = view_depth_ranks(
                pm.depth, pm.visibility, GAUSS_AXIS, gauss_size
            )
            img = merge_depth_partials(
                pm.rgb, pm.logt, bg, GAUSS_AXIS, gauss_size, ranks=ranks
            )
            return img, pm.radii, pm.visibility

        render_view = exchange_render if exact else partials_render

        def view_loss(act, features, contrast, tap, im, inow, inext):
            img_main, radii, vis = render_view(
                act, features, data.cameras, im, tap
            )
            gt_main = data.images[im]
            if mode == "rgb":
                loss, _ = rgb_total_loss(img_main, gt_main, lambda_dssim)
            elif mode == "gray":
                loss, _ = gray_total_loss(img_main, gt_main, lambda_dssim)
            else:
                img_now, _, _ = render_view(
                    act, features, data.event_cameras, inow, None
                )
                img_next, _, _ = render_view(
                    act, features, data.event_cameras, inext, None
                )
                loss, _ = event_total_loss(
                    img_now,
                    img_next,
                    img_main,
                    data.event_images[inow],
                    data.event_images[inext],
                    gt_main,
                    effective_contrast(
                        contrast, event_cfg.contrast_parameterization
                    ),
                    gt_contrast=event_cfg.gt_contrast,
                    event_weight=event_cfg.event_weight,
                )
                if mode == "event_deblur":
                    loss, _ = deblur_mix(
                        loss, img_main, data.blurry_images[im],
                        event_cfg.blur_alpha,
                    )
            return loss, (radii, vis)

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

        # taps: per local view, the screen-grad zeros for this shard's slots
        # under each rendered camera — [B, K, C/K, 2] in exact mode (one tap
        # per group view), [B, C/K, 2] in partials mode.
        #
        # The taps MUST be marked device-varying (pcast) before entering AD:
        # a mesh-invariant zeros array is a *replicated* input, and shard_map
        # AD then returns the psum over every device's loss — i.e. each
        # device's tap gradient would be the norm-of-sum of OTHER views'
        # screen gradients instead of its own view's (B× inflated densify
        # stats, measured in tests/test_parallel.py::TestShardedStep::
        # test_batched_stats_match_per_view_sum).
        tap_axes = (DATA_AXIS, GAUSS_AXIS)
        if exact:
            taps = jnp.zeros((b_local, gauss_size, cap_local, 2))
        else:
            taps = jnp.zeros((b_local, cap_local, 2))
        taps = jax.lax.pcast(taps, tap_axes, to="varying")
        train_tree = trainable_dict(state.params)
        (loss, (radii, vis)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(train_tree, state.contrast, taps)
        g_params, g_contrast, g_taps = grads

        # Cross-rank gradient reduction happens INSIDE autodiff, not here:
        # train_tree is data-invariant (replicated over ``data``), so the
        # AD transpose already psums its gradient over ``data``; contrast is
        # fully replicated, so its gradient arrives summed over every axis
        # the loss varies on.  In exact mode the all_to_all transposes have
        # likewise already routed each gauss peer's sensitivities back to
        # the owning shard.  Explicit psums here would double-count
        # (verified by the per-view-sum stats test above).
        loss_axes = (DATA_AXIS, GAUSS_AXIS) if exact else DATA_AXIS

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
        # worth per step); ×B undoes the loss's batch-mean normalization.
        # exact mode shapes carry an extra group-view axis: [B, K, C/K].
        # The (0.5W, 0.5H) factor matches the reference CUDA backward's
        # NDC-Jacobian pre-scaling of mean2D gradients (models/densify.py:
        # update_stats) — the 2e-4 threshold is defined at that scale.
        view_axes = (0, 1) if exact else (0,)
        vis_f = vis.astype(jnp.float32)
        g_taps_scaled = g_taps * jnp.asarray(
            [0.5 * data.cameras.width, 0.5 * data.cameras.height],
            g_taps.dtype,
        )
        gnorm = jnp.linalg.norm(g_taps_scaled, axis=-1) * b_global
        acc = jax.lax.psum(jnp.sum(gnorm * vis_f, axis=view_axes), DATA_AXIS)
        den = jax.lax.psum(jnp.sum(vis_f, axis=view_axes), DATA_AXIS)
        rmax = jax.lax.pmax(
            jnp.max(radii * vis_f, axis=view_axes), DATA_AXIS
        )
        new_stats = DensifyStats(
            grad_accum=state.stats.grad_accum + acc,
            denom=state.stats.denom + den,
            max_radii2d=jnp.maximum(state.stats.max_radii2d, rmax),
        )

        any_vis = jax.lax.pmax(
            jnp.any(vis, axis=view_axes).astype(jnp.int32), DATA_AXIS
        )
        metrics = {
            "loss": jax.lax.psum(loss, loss_axes),
            "contrast": effective_contrast(
                new_contrast, event_cfg.contrast_parameterization
            ),
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
    idx_spec = P((DATA_AXIS, GAUSS_AXIS)) if exact else P(DATA_AXIS)

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
                    state_specs, data_specs, idx_spec, idx_spec,
                    idx_spec, P(),
                ),
                out_specs=(state_specs, metric_specs),
            )
            traced = jax.jit(mapped).trace(
                state, data, idx_main, idx_now, idx_next, bg
            )
            with _jax_config._check_vma(False):
                cache[key] = traced.lower().compile()
        return cache[key](state, data, idx_main, idx_now, idx_next, bg)

    # exposed for the memory-contract test (tests/test_parallel.py): the
    # compiled executables' memory_analysis pins the O(N/K)-state promise
    step.compiled_cache = cache
    return step
