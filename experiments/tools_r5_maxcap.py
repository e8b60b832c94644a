#!/usr/bin/env python
"""R5 scale probe: largest capacity that fits one v5e chip at 1080p.

Builds a CAP-splat synthetic scene (photographic splat statistics so the
instance density stays production-like), then runs the FULL event train
step (3 renders + grads + Adam — the bench.py semantics) at 1080p and
reports step time and instance counts.  Run per-capacity as its own
process (an OOM can take the client down):

    CAP=2097152 python experiments/tools_r5_maxcap.py
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import make_camera, stack_cameras
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.train import SceneData, init_train_state
from event3dgs_tpu.train.loop import measure_instance_cap
from event3dgs_tpu.train.step import make_train_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

CAP = int(os.environ.get("CAP", 2_097_152))
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 3))


def main():
    rng = np.random.default_rng(0)
    n = CAP
    means = np.c_[rng.uniform(-3, 3, n), rng.uniform(-1.8, 1.8, n),
                  rng.uniform(2, 10, n)].astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    # small splats: keeps per-splat tile coverage ~1-2 so the instance
    # budget scales like a trained photographic model's
    scales = (np.exp(rng.uniform(np.log(0.002), np.log(0.006), (n, 1)))
              * rng.uniform(0.8, 1.2, (n, 3))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)

    cams = [
        make_camera(np.eye(3), np.asarray([0.01 * i, 0.0, 0.02 * i]),
                    1.2, 0.75, W, H)
        for i in range(4)
    ]
    cameras = stack_cameras(cams)
    images = jnp.asarray(rng.uniform(0, 1, (4, H, W, 3)), jnp.float32)

    params = init_from_point_cloud(means, colors, capacity=n)
    params = params.replace(
        scaling=jnp.asarray(np.log(scales), jnp.float32),
        rotation=jnp.asarray(rots, jnp.float32),
        opacity=jnp.asarray(np.log(opac / (1 - opac))[:, None], jnp.float32),
    )
    state = init_train_state(params, spatial_lr_scale=3.0)
    data = SceneData(cameras=cameras, images=images,
                     event_cameras=cameras, event_images=images)
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(state))
    print(f"capacity {n:,}: state {state_bytes/2**30:.2f} GiB", flush=True)

    icap = measure_instance_cap(state.params, cameras)
    print(f"instance cap {icap:,} ({icap/n:.2f}/splat)", flush=True)

    step = make_train_step(
        "event", OptimizationConfig(), EventConfig(),
        spatial_lr_scale=3.0, rasterizer="tiled", instance_cap=icap,
    )
    bg = jnp.zeros(3)
    i0, i1, i2 = (jnp.asarray(v) for v in (1, 1, 2))
    state, m = step(state, data, i0, i1, i2, bg)
    jax.block_until_ready(state.params.xyz)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, data, i0, i1, i2, bg)
    jax.block_until_ready(state.params.xyz)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"OK cap={n:,}: {dt*1e3:.0f} ms/step "
          f"({3*W*H/dt/1e6:.1f} Mpix/s), loss={float(m['loss']):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
