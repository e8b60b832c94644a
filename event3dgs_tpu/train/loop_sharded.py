"""Host-side training loop over a (data × gauss) device mesh.

The multi-chip counterpart of ``train/loop.py``: each compiled step consumes
``B = |data|`` views (one per data rank) through
``parallel.sharded_train.make_sharded_train_step`` — per-view losses and
gradients psum across ``data``, Gaussian storage stays sharded over
``gauss`` the whole time.  ``state.step`` counts *reference iterations*
(views consumed), so every cadence of the reference schedule — densify
every ``densification_interval``, opacity reset, SH warm-up, lr decay
(`/root/reference/train.py:95-332`) — fires at the same points in
view-count as the single-device loop; with a batch stride the loop fires
them on interval *crossings*.

Densification is a host event (it already syncs the host in the
single-device loop): the state is pulled to replicated host arrays, the
exact single-device densify (+ capacity growth, never dropping candidates)
runs globally, and the state is re-placed on the mesh.  Under the default
exact gauss strategy (``cfg.pipeline.gauss_mode="exact"``) slot layout is
irrelevant — the per-view splat exchange restores the unsharded order; the
opt-in ``"partials"`` strategy additionally re-partitions the Gaussians
into depth quantiles to minimise its merge's ordering error.  Either way
this costs one gather+scatter of the parameter set every
``densification_interval`` views — amortized noise next to the render work.

Multi-host: build the mesh with ``parallel.distributed.make_global_mesh``
and pass ``view_batch_fn`` to supply globally-consistent per-step view
batches (every process must run this loop with identical control flow; the
default sampler is deterministic in the seed so that holds automatically).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import random as pyrandom

from event3dgs_tpu.train.loop import (
    INSTANCE_RECHECK_INTERVAL,
    TrainCallbacks,
    TrainResult,
    densify_with_growth,
    measure_instance_cap,
    pick_view_index,
)
from event3dgs_tpu.train.state import SceneData, TrainState
from event3dgs_tpu.train.step import make_densify_step, opacity_reset_step
from event3dgs_tpu.utils.config import TrainConfig


def _crossed(prev: int, now: int, interval: int) -> bool:
    """Did the view counter cross a multiple of ``interval``?"""
    return now // interval > prev // interval


def train_loop_sharded(
    state: TrainState,
    data: SceneData,
    cfg: TrainConfig,
    mode: str,
    extent: float,
    mesh,
    iterations: Optional[int] = None,
    callbacks: Optional[TrainCallbacks] = None,
    view_batch_fn: Optional[Callable] = None,
) -> TrainResult:
    """Run the optimization on a device mesh.

    Args mirror ``train_loop``; ``mesh`` is a ("data", "gauss") Mesh and
    ``view_batch_fn(it) -> (idx_main [B], idx_now [B], idx_next [B])``
    optionally overrides view sampling (multi-host data pipelines).
    """
    # imported here, not at module scope: event3dgs_tpu.parallel imports
    # train.state/train.step, so a top-level import would be circular
    from event3dgs_tpu.parallel.partition import repartition_by_depth
    from event3dgs_tpu.parallel.sharded_train import (
        make_sharded_train_step,
        shard_train_state,
        unshard_state,
    )

    opt = cfg.optimization
    ev = cfg.event
    iters = iterations or opt.iterations
    callbacks = callbacks or TrainCallbacks()
    gauss = mesh.shape["gauss"]
    gauss_mode = getattr(cfg.pipeline, "gauss_mode", "exact")
    exact = gauss_mode == "exact"
    # exact mode: the gauss axis renders its own views → B = data·gauss
    # views per step; partials replicates each view across the gauss group.
    b = mesh.shape["data"] * (gauss if exact else 1)

    opacity_reset_interval = (
        ev.opacity_reset_interval if mode.startswith("event")
        else opt.opacity_reset_interval
    )
    holdout = mode != "rgb"

    use_tiled = cfg.pipeline.rasterizer == "tiled"
    # per-shard budget: each shard bins only its own Gaussians, but the
    # front shard of a depth partition can still hold most of a view's
    # instances — budget the full-scene count per shard (safe upper bound)
    instance_cap = (
        measure_instance_cap(state.params, data.cameras) if use_tiled
        else None
    )

    def build_step():
        return make_sharded_train_step(
            mode, opt, ev, mesh,
            max_sh_degree=state.max_sh_degree,
            spatial_lr_scale=state.spatial_lr_scale,
            rasterizer=cfg.pipeline.rasterizer,
            instance_cap=instance_cap,
            gauss_mode=gauss_mode,
        )

    step_fn = build_step()
    densify_fn = make_densify_step(opt, extent)

    # the exchange path restores the exact unsharded splat order per view,
    # so slot layout is irrelevant; the partials merge wants depth-quantile
    # shards to minimise its ordering error
    if not exact:
        state = repartition_by_depth(state, data.cameras, gauss)
    state = shard_train_state(state, mesh)

    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
    view_rng = pyrandom.Random(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    np_rng = np.random.default_rng(cfg.seed)

    def default_view_batch(_it):
        idx = [
            pick_view_index(view_rng, data.num_views, mode, holdout)
            for _ in range(b)
        ]
        main = jnp.asarray(idx, jnp.int32)
        return main, main, main + 1

    sample = view_batch_fn or default_view_batch

    history = []
    t0 = time.perf_counter()
    it = 0
    while it < iters:
        idx_main, idx_now, idx_next = sample(it)
        iter_bg = (
            jnp.asarray(np_rng.uniform(size=3), jnp.float32)
            if opt.random_background else bg
        )
        state, metrics = step_fn(state, data, idx_main, idx_now, idx_next,
                                 iter_bg)
        prev, it = it, it + b

        if _crossed(prev, it, callbacks.log_every):
            if callbacks.on_metrics:
                callbacks.on_metrics(it, jax.device_get(metrics))
            if callbacks.on_tick:
                callbacks.on_tick(it, unshard_state(state))
        history.append(float(metrics["loss"]))

        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and _crossed(
                prev, it, opt.densification_interval
            ):
                key, sub = jax.random.split(key)
                use_size_prune = it > opacity_reset_interval
                # host round-trip: global densify + depth repartition
                host_state = unshard_state(state)
                host_state, grew = densify_with_growth(
                    host_state, densify_fn, sub, use_size_prune
                )
                if not exact:
                    host_state = repartition_by_depth(
                        host_state, data.cameras, gauss
                    )
                if grew and callbacks.on_metrics:
                    callbacks.on_metrics(
                        it, {"capacity": host_state.params.capacity}
                    )
                if use_tiled:
                    needed = measure_instance_cap(
                        host_state.params, data.cameras
                    )
                    if needed > instance_cap:
                        instance_cap = needed
                        step_fn = build_step()
                state = shard_train_state(host_state, mesh)
            if _crossed(prev, it, opacity_reset_interval) or (
                cfg.model.white_background
                and prev < opt.densify_from_iter <= it
            ):
                host_state = unshard_state(state)
                host_state = opacity_reset_step(host_state)
                state = shard_train_state(host_state, mesh)
        elif use_tiled and _crossed(prev, it, INSTANCE_RECHECK_INTERVAL):
            # post-densify-window guard (see train/loop.py): growing scales
            # must not silently overflow the instance budget
            needed = measure_instance_cap(unshard_state(state).params,
                                          data.cameras)
            if needed > instance_cap:
                instance_cap = needed
                step_fn = build_step()
                if callbacks.on_metrics:
                    callbacks.on_metrics(it, {"instance_cap": instance_cap})

        if callbacks.on_save and any(
            prev < s <= it for s in cfg.save_iterations
        ):
            callbacks.on_save(it, unshard_state(state))
        if callbacks.on_checkpoint and any(
            prev < s <= it for s in cfg.checkpoint_iterations
        ):
            callbacks.on_checkpoint(it, unshard_state(state))

    jax.block_until_ready(state.params.xyz)
    return TrainResult(
        state=unshard_state(state),
        history=history,
        wall_time=time.perf_counter() - t0,
    )
