"""BASELINE config 4 scale demonstration: 1M Gaussians, 1080p, event mode.

The reference's config-4 target is a real event dataset at ~1M Gaussians and
1080p on the full 30k 3DGS schedule.  This script proves the SCALE point on
one chip: builds a 1M-splat model directly, runs the full compiled event
train step (3 renders + loss + grads + Adam + stats) at 1080p, and reports
it/s + instance statistics.  Memory: 1M splats ≈ 720 MB of state
(SCALING.md) + the measured instance slab.

Run on TPU: python experiments/tools_scale_1m.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import make_camera, stack_cameras
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.train import SceneData, init_train_state
from event3dgs_tpu.train.loop import measure_instance_cap
from event3dgs_tpu.train.step import make_train_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W, H = 1920, 1080
STEPS = 20


def main():
    rng = np.random.default_rng(0)
    pts = np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                rng.uniform(2, 10, N)]
    cols = rng.uniform(0.1, 1.0, (N, 3))

    t0 = time.perf_counter()
    params = init_from_point_cloud(pts, cols, capacity=N)
    # realistic sub-pixel-to-few-pixel splats at this density
    scales = (np.exp(rng.uniform(np.log(0.002), np.log(0.008), (N, 1)))
              * rng.uniform(0.7, 1.4, (N, 3)))
    params = params.replace(scaling=jnp.asarray(np.log(scales), jnp.float32))
    state = init_train_state(params, spatial_lr_scale=3.0)
    print(f"init {N} splats: {time.perf_counter()-t0:.1f}s", flush=True)

    cams = [
        make_camera(np.eye(3), np.asarray([0.01 * i, 0, 0.02 * i]), 1.2,
                    0.75, W, H)
        for i in range(4)
    ]
    cameras = stack_cameras(cams)
    images = jnp.asarray(rng.uniform(0, 1, (4, H, W, 3)), jnp.float32)
    data = SceneData(cameras=cameras, images=images, event_cameras=cameras,
                     event_images=images)

    icap = measure_instance_cap(state.params, cameras)
    print(f"instance cap: {icap} ({icap/1e6:.2f}M instances budgeted)",
          flush=True)

    step = make_train_step(
        "event", OptimizationConfig(), EventConfig(), spatial_lr_scale=3.0,
        rasterizer="tiled", instance_cap=icap,
    )
    bg = jnp.zeros(3)
    i0, i1, i2 = (jnp.asarray(v) for v in (1, 1, 2))
    t0 = time.perf_counter()
    state, metrics = step(state, data, i0, i1, i2, bg)
    jax.block_until_ready(state.params.xyz)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f} "
          f"visible={int(metrics['num_visible'])}", flush=True)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, data, i0, i1, i2, bg)
    jax.block_until_ready(state.params.xyz)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{N} splats @ {W}x{H} event step: {dt*1e3:.1f} ms/it "
          f"({1/dt:.2f} it/s, {3*W*H/dt/1e6:.1f} Mpix/s, "
          f"loss={float(metrics['loss']):.4f})", flush=True)


if __name__ == "__main__":
    main()
