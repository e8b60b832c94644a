#!/usr/bin/env python
"""R5: dispatch-amortization probe — per-call train steps vs a fused
multi-step lax.scan in ONE dispatch.

If the per-call and scanned per-step times differ materially, the gap is
host/relay dispatch overhead, not device compute — and a scanned
production loop (steps between densify checks are independent of host
decisions) recovers it legitimately.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from bench import _scene, N_GAUSSIANS, WIDTH, HEIGHT
from event3dgs_tpu.core.camera import make_camera, stack_cameras
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.train import SceneData, init_train_state
from event3dgs_tpu.train.loop import measure_instance_cap
from event3dgs_tpu.train.step import make_train_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig


def main():
    means, scales, rots, opac, colors = _scene(np, jnp)
    n = N_GAUSSIANS
    cams = [
        make_camera(np.eye(3), np.asarray([0.01 * i, 0.0, 0.02 * i]),
                    1.2, 0.75, WIDTH, HEIGHT)
        for i in range(4)
    ]
    cameras = stack_cameras(cams)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (4, HEIGHT, WIDTH, 3)), jnp.float32)
    params = init_from_point_cloud(means, colors, capacity=n)
    params = params.replace(
        scaling=jnp.asarray(np.log(scales), jnp.float32),
        rotation=jnp.asarray(rots, jnp.float32),
        opacity=jnp.asarray(np.log(opac / (1 - opac))[:, None], jnp.float32),
    )
    state = init_train_state(params, spatial_lr_scale=3.0)
    data = SceneData(cameras=cameras, images=images,
                     event_cameras=cameras, event_images=images)
    icap = measure_instance_cap(state.params, cameras)
    print("instance cap:", icap)
    step = make_train_step(
        "event", OptimizationConfig(), EventConfig(),
        spatial_lr_scale=3.0, rasterizer="tiled", instance_cap=icap,
    )
    bg = jnp.zeros(3)
    i0, i1, i2 = (jnp.asarray(v) for v in (1, 1, 2))

    # --- per-call loop (the bench.py shape) ---
    st = state
    st, _ = step(st, data, i0, i1, i2, bg)
    jax.block_until_ready(st.params.xyz)
    ITERS = 6
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, metrics = step(st, data, i0, i1, i2, bg)
    jax.block_until_ready(st.params.xyz)
    per_call = (time.perf_counter() - t0) / ITERS
    print(f"per-call step: {per_call*1e3:.1f} ms  "
          f"({3*WIDTH*HEIGHT/per_call/1e6:.1f} Mpix/s)")

    # --- scanned K steps in one dispatch ---
    K = 8

    @jax.jit
    def scan_steps(st, data, idx3, bg):
        def body(st, idx):
            st, m = step.__wrapped__(st, data, idx[0], idx[1], idx[2], bg) \
                if hasattr(step, "__wrapped__") else step(st, data, idx[0], idx[1], idx[2], bg)
            return st, m["loss"]
        return jax.lax.scan(body, st, idx3)

    idx3 = jnp.tile(jnp.asarray([[1, 1, 2]]), (K, 1))
    st2, losses = scan_steps(state, data, idx3, bg)
    jax.block_until_ready(st2.params.xyz)
    REP = 3
    t0 = time.perf_counter()
    for _ in range(REP):
        st2, losses = scan_steps(st2, data, idx3, bg)
    jax.block_until_ready(st2.params.xyz)
    per_scan = (time.perf_counter() - t0) / (REP * K)
    print(f"scanned step ({K}/dispatch): {per_scan*1e3:.1f} ms  "
          f"({3*WIDTH*HEIGHT/per_scan/1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
