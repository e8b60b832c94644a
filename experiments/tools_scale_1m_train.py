"""1M-splat / 1080p TRAINING run (BASELINE config-4 shape, shortened).

PROFILE_r3 pinned the 1M/1080p step TIME (1.2 s/it); this actually TRAINS
at that shape: a 100k-splat ground-truth world rendered to 12 1080p views
with the tiled rasterizer, a 1M-slot model initialized from a noisy 10×
replication of the true points, and a 300-iteration gray run through the
production train_loop (densification off — capacity is the point here).
Reports the loss curve, it/s, and memory-relevant counts.

Run on TPU: python experiments/tools_scale_1m_train.py  [ITERS=300]

DENSIFY=1 (round 5): start with ~900k alive of the 1M capacity and run the
densification machinery every 50 iterations — clone/split/prune and the
capacity-growth path have never executed at this scale before.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import make_camera, stack_cameras
from event3dgs_tpu.core.sh import rgb_to_sh
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.ops.render import render
from event3dgs_tpu.train import SceneData, init_train_state, train_loop
from event3dgs_tpu.utils.config import OptimizationConfig, TrainConfig

ITERS = int(os.environ.get("ITERS", 300))
W, H = 1920, 1080
N_TRUE = 100_000
CAPACITY = 1 << 20  # 1,048,576 slots
N_VIEWS = 12


def main():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(N_TRUE, 3)) * np.array([0.9, 0.6, 0.9])
    cols = rng.uniform(0.1, 1.0, (N_TRUE, 3))
    scales = np.exp(rng.uniform(np.log(0.004), np.log(0.02), (N_TRUE, 1)))
    scales = np.tile(scales, (1, 3)) * rng.uniform(0.8, 1.2, (N_TRUE, 3))
    quats = rng.normal(size=(N_TRUE, 4))
    opac = rng.uniform(0.55, 0.95, N_TRUE)

    feats = jnp.zeros((N_TRUE, 16, 3), jnp.float32).at[:, 0, :].set(
        rgb_to_sh(jnp.asarray(cols, jnp.float32))
    )
    cams = []
    for i in range(N_VIEWS):
        th = 2 * np.pi * i / N_VIEWS
        pos = np.array([4.0 * np.sin(th), 0.6, -4.0 * np.cos(th)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        r = np.stack([right, np.cross(fwd, right), fwd], axis=1)
        cams.append(make_camera(r, -r.T @ pos, 1.0, 0.6, W, H))
    cameras = stack_cameras(cams)

    print("rendering GT views (tiled)...", flush=True)
    bg = jnp.ones(3)
    gts = []
    for i in range(N_VIEWS):
        cam = jax.tree.map(lambda x: x[i], cameras)
        img = render(
            jnp.asarray(pts, jnp.float32), feats,
            jnp.asarray(opac, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(quats, jnp.float32), cam, bg, sh_degree=0,
            rasterizer="tiled",
        ).image
        gts.append(np.clip(np.asarray(img), 0, 1))
    images = jnp.asarray(np.stack(gts), jnp.float32)

    # 1M-slot model: true points replicated 10x with noise (the init must
    # be learned back toward the truth, and every slot is alive)
    densify_on = os.environ.get("DENSIFY", "") not in ("", "0")
    n_init = (CAPACITY * 9) // 10 if densify_on else CAPACITY
    reps = n_init // N_TRUE + 1
    init_pts = np.tile(pts, (reps, 1))[:n_init]
    init_cols = np.tile(cols, (reps, 1))[:n_init]
    init_pts = init_pts + rng.normal(size=init_pts.shape) * 0.03
    params = init_from_point_cloud(init_pts, init_cols, capacity=CAPACITY)
    state = init_train_state(params, spatial_lr_scale=4.4)
    print(f"model: capacity={params.capacity} "
          f"alive={int(np.asarray(params.alive).sum())}", flush=True)

    data = SceneData(cameras=cameras, images=images)
    if densify_on:
        cfg = TrainConfig(optimization=OptimizationConfig(
            densify_from_iter=50, densify_until_iter=ITERS,
            densification_interval=50,
            opacity_reset_interval=10 ** 9,
        ))
    else:
        cfg = TrainConfig(optimization=OptimizationConfig(
            densify_from_iter=10 ** 9, densify_until_iter=0,
        ))
    cfg.pipeline.rasterizer = "tiled"

    t0 = time.perf_counter()
    res = train_loop(state, data, cfg, "rgb", 4.4, iterations=ITERS)
    wall = time.perf_counter() - t0
    h = res.history
    k = max(len(h) // 10, 1)
    print("loss curve:", [round(float(np.mean(h[i:i+k])), 4)
                          for i in range(0, len(h), k)])
    print(f"{ITERS} iters in {wall:.1f}s = {ITERS/wall:.2f} it/s "
          f"({ITERS/wall*W*H/1e6:.1f} Mpix/s single-render steps)")
    assert np.isfinite(h).all()
    assert np.mean(h[-3 * k:]) < np.mean(h[:3 * k]), "loss did not decrease"
    alive_end = int(np.asarray(res.state.params.alive).sum())
    print(f"alive at end: {alive_end:,} "
          f"(capacity {res.state.params.capacity:,})")
    if densify_on:
        print("OK: 1M-splat 1080p training WITH DENSIFICATION healthy")
    else:
        print("OK: 1M-splat 1080p training run healthy")


if __name__ == "__main__":
    main()
