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

from event3dgs_tpu.train.state import SceneData, TrainState
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
    """Hooks invoked from the loop (logging, saving, eval)."""

    on_metrics: Optional[Callable] = None  # (iteration, metrics dict)
    on_save: Optional[Callable] = None  # (iteration, state)
    on_checkpoint: Optional[Callable] = None  # (iteration, state)
    log_every: int = 10


@dataclass
class TrainResult:
    state: TrainState
    history: list = field(default_factory=list)
    wall_time: float = 0.0


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

    step_fn = make_train_step(
        mode,
        opt,
        ev,
        max_sh_degree=state.max_sh_degree,
        spatial_lr_scale=state.spatial_lr_scale,
        rasterizer=cfg.pipeline.rasterizer,
    )
    densify_fn = make_densify_step(opt, extent)

    if cfg.model.white_background:
        bg = jnp.ones(3)
    else:
        bg = jnp.zeros(3)

    view_rng = pyrandom.Random(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    np_rng = np.random.default_rng(cfg.seed)

    history = []
    t0 = time.perf_counter()
    for it in range(1, iters + 1):
        idx = pick_view_index(view_rng, data.num_views, mode, holdout)
        iter_bg = (
            jnp.asarray(np_rng.uniform(size=3), jnp.float32)
            if opt.random_background
            else bg
        )
        state, metrics = step_fn(
            state,
            data,
            jnp.asarray(idx),
            jnp.asarray(idx),
            jnp.asarray(idx + 1),
            iter_bg,
        )

        if callbacks.on_metrics and it % callbacks.log_every == 0:
            callbacks.on_metrics(it, jax.device_get(metrics))
        history.append(float(metrics["loss"]))

        # Densification (`train.py:316-327`)
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                key, sub = jax.random.split(key)
                use_size_prune = it > opacity_reset_interval
                state, overflow = densify_fn(state, sub, use_size_prune)
                ovf = int(overflow)
                if ovf > 0 and callbacks.on_metrics:
                    callbacks.on_metrics(it, {"densify_overflow": ovf})
            if it % opacity_reset_interval == 0 or (
                cfg.model.white_background and it == opt.densify_from_iter
            ):
                state = opacity_reset_step(state)

        if callbacks.on_save and it in cfg.save_iterations:
            callbacks.on_save(it, state)
        if callbacks.on_checkpoint and it in cfg.checkpoint_iterations:
            callbacks.on_checkpoint(it, state)

    jax.block_until_ready(state.params.xyz)
    return TrainResult(
        state=state, history=history, wall_time=time.perf_counter() - t0
    )
