"""Host-side training loop: view sampling, densification cadence, checkpoints.

Replays the reference's control flow (`train.py:75-336`): random view pick
with the manual test-view holdout, SH degree warm-up (inside the step),
densify every `densification_interval` after `densify_from_iter` until
`densify_until_iter`, opacity reset every `opacity_reset_interval` (overridden
to 10k in event mode), Adam step every iteration.
"""

from __future__ import annotations

import random as pyrandom
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from event3dgs_tpu.models.gaussians import activated
from event3dgs_tpu.ops.binning import count_instances, suggest_instance_cap
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.train.state import SceneData, TrainState, grow_state
from event3dgs_tpu.train.step import (
    make_densify_step,
    make_train_step,
    opacity_reset_step,
)
from event3dgs_tpu.utils.config import TrainConfig

# Views held out for evaluation in gray/event modes (`train.py:126-131`,
# `eval.py:118`).
TEST_VIEW_INDICES = (5, 25, 45, 65, 85)


@dataclass
class TrainCallbacks:
    """Hooks invoked from the loop (logging, saving, eval, GUI)."""

    on_metrics: Optional[Callable] = None  # (iteration, metrics dict)
    on_save: Optional[Callable] = None  # (iteration, state)
    on_checkpoint: Optional[Callable] = None  # (iteration, state)
    on_tick: Optional[Callable] = None  # (iteration, live state), log_every
    log_every: int = 10


@dataclass
class TrainResult:
    state: TrainState
    history: list = field(default_factory=list)
    wall_time: float = 0.0


@jax.jit
def _probe_instance_count(params, camera):
    """Measured (tile, gaussian) instance count of one view — the cheap
    counting half of binning (`ops/binning.py:count_instances`), used to
    size the rasterizer's static instance budget adaptively (the CUDA
    rasterizer allocates its buffer per frame; the TPU equivalent is a cap
    chosen from measurements, re-jitted on the rare growth event)."""
    act = activated(params)
    proj = project_gaussians(
        act.means3d, act.scales, act.rotations, camera,
        opacities=act.opacities,
    )
    return count_instances(
        proj.mean2d, proj.radius, proj.valid, camera.width, camera.height,
        conic=proj.conic, opacities=act.opacities,
    )


def measure_instance_cap(
    params, cameras, probe_views=8, margin: float = 1.5
) -> int:
    """Suggested instance cap: max measured count over a camera probe set,
    with headroom for densification growth between re-measurements."""
    n_views = cameras.camera_center.shape[0]
    step = max(1, n_views // probe_views)
    worst = 0
    for v in range(0, n_views, step):
        cam = jax.tree.map(lambda x: x[v], cameras)
        worst = max(worst, int(_probe_instance_count(params, cam)))
    return suggest_instance_cap(worst, margin)


def densify_with_growth(
    state: TrainState, densify_fn, rng, use_size_prune: bool,
    growth: float = 1.5,
):
    """Run a densify step, growing capacity (re-jit) until nothing is
    dropped — the reference never drops densification candidates
    (`scene/gaussian_model.py:349-403`); the fixed-capacity TPU design
    makes growth an explicit, rare host event instead of a per-step
    reallocation.

    Returns (state, grew: bool).  The densify step is deterministic in
    (state, rng), so a dropped attempt is simply discarded and re-run at
    the larger capacity with the same rng.
    """
    new_state, overflow = densify_fn(state, rng, use_size_prune)
    grew = False
    while int(overflow) > 0:
        new_cap = int(state.params.capacity * growth) + int(overflow)
        new_cap = -(-new_cap // 256) * 256
        state = grow_state(state, new_cap)
        grew = True
        new_state, overflow = densify_fn(state, rng, use_size_prune)
    return new_state, grew


# Cadence (in reference iterations) of the post-densify-window instance-cap
# re-measurement — coarse enough to be amortized noise, fine enough that a
# drifting scene cannot silently exceed the 1.5x measurement margin for long.
INSTANCE_RECHECK_INTERVAL = 1000


def pick_view_index(rng: pyrandom.Random, n_views: int, mode: str, holdout: bool):
    """Random view selection with the reference's quirks (`train.py:116-131`):
    event mode samples [2, n-4]; others [2, n-3]; gray/event skip the manual
    test views by decrementing."""
    if mode.startswith("event"):
        idx = rng.randint(2, n_views - 4)
    else:
        idx = rng.randint(2, n_views - 3)
    if holdout and idx in TEST_VIEW_INDICES:
        idx -= 1
    return idx


def train_loop(
    state: TrainState,
    data: SceneData,
    cfg: TrainConfig,
    mode: str,
    extent: float,
    iterations: Optional[int] = None,
    callbacks: Optional[TrainCallbacks] = None,
) -> TrainResult:
    """Run the optimization.

    Args:
        state: initial train state.
        data: device-resident scene data.
        cfg: full config; optimization/event subsections drive the schedule.
        mode: "rgb" | "gray" | "event" | "event_deblur".
        extent: nerf++ scene radius (densification scale reference).
        iterations: override cfg.optimization.iterations.
    """
    opt = cfg.optimization
    ev = cfg.event
    iters = iterations or opt.iterations
    callbacks = callbacks or TrainCallbacks()

    opacity_reset_interval = (
        ev.opacity_reset_interval if mode.startswith("event")
        else opt.opacity_reset_interval
    )
    holdout = mode != "rgb"  # gray/event hold out the manual test views

    # adaptive instance budget for the tiled rasterizer: measured at start,
    # re-measured (and the step re-built on growth) at densify boundaries
    use_tiled = cfg.pipeline.rasterizer == "tiled"
    instance_cap = (
        measure_instance_cap(state.params, data.cameras) if use_tiled else None
    )

    def build_step():
        return make_train_step(
            mode,
            opt,
            ev,
            max_sh_degree=state.max_sh_degree,
            spatial_lr_scale=state.spatial_lr_scale,
            rasterizer=cfg.pipeline.rasterizer,
            instance_cap=instance_cap,
        )

    step_fn = build_step()
    densify_fn = make_densify_step(opt, extent)

    if cfg.model.white_background:
        bg = jnp.ones(3)
    else:
        bg = jnp.zeros(3)

    view_rng = pyrandom.Random(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    np_rng = np.random.default_rng(cfg.seed)

    # --- fused multi-step dispatch (opt-in, pipeline.fused_steps > 1) ----
    # Between host events (log ticks, densify/opacity/recheck cadences,
    # save/checkpoint/test iterations) consecutive steps are independent of
    # host decisions, so up to `fused_steps` of them run as ONE lax.scan
    # dispatch — recovering the per-dispatch overhead (PROFILE_r5.md §4)
    # with an identical step sequence (view indices and random backgrounds
    # are drawn host-side in the same order).  Chunks never CROSS an event
    # iteration; they may end on one.
    fused = max(int(getattr(cfg.pipeline, "fused_steps", 1)), 1)
    scan_cache: dict = {}

    def next_event(it0: int) -> int:
        """Smallest iteration ≥ it0 at which any host-side action fires."""
        cands = [iters]
        for interval in (
            callbacks.log_every,
            opt.densification_interval,
            opacity_reset_interval,
            INSTANCE_RECHECK_INTERVAL,
        ):
            if interval and interval > 0:
                cands.append(((it0 + interval - 1) // interval) * interval)
        for lst in (cfg.save_iterations, cfg.checkpoint_iterations,
                    cfg.test_iterations, (opt.densify_from_iter,)):
            cands.extend(t for t in lst if t >= it0)
        return min(c for c in cands if c >= it0)

    def get_scan(k: int):
        fn = scan_cache.get((id(step_fn), k))
        if fn is None:
            def run_k(st, idx3, bgs):
                def body(st, xs):
                    i3, bgv = xs
                    st, m = step_fn(st, data, i3[0], i3[1], i3[2], bgv)
                    return st, m
                return jax.lax.scan(body, st, (idx3, bgs))

            fn = jax.jit(run_k)
            scan_cache[(id(step_fn), k)] = fn
        return fn

    def draw_iter_inputs():
        idx = pick_view_index(view_rng, data.num_views, mode, holdout)
        iter_bg = (
            jnp.asarray(np_rng.uniform(size=3), jnp.float32)
            if opt.random_background
            else bg
        )
        return idx, iter_bg

    history = []
    t0 = time.perf_counter()
    it = 0
    while it < iters:
        k = min(fused, next_event(it + 1) - it) if fused > 1 else 1
        if k > 1:
            draws = [draw_iter_inputs() for _ in range(k)]
            idx3 = jnp.asarray(
                [[d[0], d[0], d[0] + 1] for d in draws], jnp.int32
            )
            bgs = jnp.stack([d[1] for d in draws])
            state, ms = get_scan(k)(state, idx3, bgs)
            losses = np.asarray(ms["loss"])
            history.extend(float(x) for x in losses)
            metrics = jax.tree.map(lambda x: x[-1], ms)
            it += k
        else:
            idx, iter_bg = draw_iter_inputs()
            state, metrics = step_fn(
                state,
                data,
                jnp.asarray(idx),
                jnp.asarray(idx),
                jnp.asarray(idx + 1),
                iter_bg,
            )
            history.append(float(metrics["loss"]))
            it += 1

        if it % callbacks.log_every == 0:
            if callbacks.on_metrics:
                callbacks.on_metrics(it, jax.device_get(metrics))
            if callbacks.on_tick:
                callbacks.on_tick(it, state)

        # Densification (`train.py:316-327`), with capacity growth: when
        # candidates outnumber free slots the buffers grow (re-jit) and the
        # densify re-runs — no candidate is ever dropped.
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                key, sub = jax.random.split(key)
                use_size_prune = it > opacity_reset_interval
                state, grew = densify_with_growth(
                    state, densify_fn, sub, use_size_prune
                )
                if grew and callbacks.on_metrics:
                    callbacks.on_metrics(
                        it, {"capacity": state.params.capacity}
                    )
                n_alive = int(state.params.alive.sum())
                if n_alive < 16:
                    import warnings

                    warnings.warn(
                        f"model nearly dead after densify at iter {it}: "
                        f"{n_alive} alive gaussians. Common causes: the "
                        "reference's hardcoded 20px screen-size prune vs "
                        "large splats, or an opacity collapse (see "
                        "RESULTS_r3.json failure analysis).",
                        stacklevel=2,
                    )
                # instance budget: re-measure after the scene changed; grow
                # the cap (rebuild = one re-jit) before the binning path
                # would overflow and silently drop instances
                if use_tiled:
                    needed = measure_instance_cap(state.params, data.cameras)
                    if needed > instance_cap:
                        instance_cap = needed
                        step_fn = build_step()
                        if callbacks.on_metrics:
                            callbacks.on_metrics(
                                it, {"instance_cap": instance_cap}
                            )
            if it % opacity_reset_interval == 0 or (
                cfg.model.white_background and it == opt.densify_from_iter
            ):
                state = opacity_reset_step(state)
        elif use_tiled and it % INSTANCE_RECHECK_INTERVAL == 0:
            # Post-densify-window guard: scales keep training after
            # densify_until_iter, so per-view instance counts can still
            # outgrow the budget — without this, expand_instances would
            # clamp to the cap and silently drop the deepest instances.
            # Re-measure on a coarse cadence and grow the cap (one re-jit).
            needed = measure_instance_cap(state.params, data.cameras)
            if needed > instance_cap:
                instance_cap = needed
                step_fn = build_step()
                if callbacks.on_metrics:
                    callbacks.on_metrics(it, {"instance_cap": instance_cap})

        if callbacks.on_save and it in cfg.save_iterations:
            callbacks.on_save(it, state)
        if callbacks.on_checkpoint and it in cfg.checkpoint_iterations:
            callbacks.on_checkpoint(it, state)

    jax.block_until_ready(state.params.xyz)
    return TrainResult(
        state=state, history=history, wall_time=time.perf_counter() - t0
    )
