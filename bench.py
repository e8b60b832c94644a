#!/usr/bin/env python
"""Headline benchmark: end-to-end event-mode training throughput at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the COMPLETE compiled event-mode train step — the reference's hot
loop (`/root/reference/train.py:149-212`): three differentiable renders
(main + consecutive event pair) through the tiled Pallas rasterizer, the
event mixture loss with learnable contrast, gradients for all six parameter
groups + contrast + the densification tap, the Adam updates, and the stats
accumulation.  Throughput counts all rendered pixels (3·W·H per step).
Inputs are perturbed every iteration — the TPU relay in this environment
caches results for bitwise-identical executions, which would otherwise fake
the numbers.

``vs_baseline`` compares against a nominal CUDA-reference training
throughput of 30 Mpix/s fwd+bwd.  The reference repo publishes no numbers
(BASELINE.md), so the constant is anchored to the original 3DGS paper's
reported training times (recalled from the literature, not fetchable in
this no-egress environment): 30k single-view iterations in roughly 20-40
minutes on an A6000-class GPU at ~0.5-1.1 Mpix render resolution →
~13-25 it/s ≈ 10-27 Mpix/s fwd+bwd.  30 Mpix/s sits at/above the top of
that band, i.e. the baseline is deliberately GENEROUS to CUDA — a
vs_baseline of 1.7 understates rather than overstates the margin.

Set BENCH_KERNEL=1 for the old kernel-only metric (one render fwd+bwd, no
optimizer) — the delta between the two numbers is the non-rasterizer share
of the step.
"""

import json
import os
import sys
import time

CUDA_BASELINE_PIX_S = 30e6

N_GAUSSIANS = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
WIDTH, HEIGHT = 1920, 1080
ITERS = int(os.environ.get("BENCH_ITERS", 5))
KERNEL_ONLY = os.environ.get("BENCH_KERNEL", "") not in ("", "0")


def _scene(np, jnp):
    rng = np.random.default_rng(0)
    n = N_GAUSSIANS
    means = np.c_[rng.uniform(-3, 3, n), rng.uniform(-1.8, 1.8, n),
                  rng.uniform(2, 10, n)]
    scales = (np.exp(rng.uniform(np.log(0.005), np.log(0.03), (n, 1)))
              * rng.uniform(0.7, 1.4, (n, 3)))
    rots = rng.normal(size=(n, 4))
    opac = rng.uniform(0.3, 0.9, n)
    colors = rng.uniform(0, 1, (n, 3))
    return means, scales, rots, opac, colors


def bench_kernel():
    """Kernel-only metric: one render fwd+bwd gradient, no optimizer."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from event3dgs_tpu.core import make_camera
    from event3dgs_tpu.ops.projection import project_gaussians
    from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled
    from event3dgs_tpu.ops.binning import count_instances, suggest_instance_cap

    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, WIDTH, HEIGHT)
    means, scales, rots, opac, colors = map(
        lambda a: jnp.asarray(a, jnp.float32), _scene(np, jnp)
    )
    bg = jnp.zeros(3)

    @jax.jit
    def _count(m, s, r, o):
        p = project_gaussians(m, s, r, cam, opacities=o)
        return count_instances(p.mean2d, p.radius, p.valid, WIDTH, HEIGHT,
                               conic=p.conic, opacities=o)

    icap = suggest_instance_cap(int(_count(means, scales, rots, opac)))
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def fwdbwd(m, s, r, o, c, eps):
        def loss(m, s, r, o, c):
            p = project_gaussians(m + eps, s, r, cam, opacities=o)
            img = rasterize_tiled(p, c, o, bg, WIDTH, HEIGHT,
                                  instance_cap=icap, interpret=interpret)
            return jnp.sum(img * img)

        g = jax.grad(loss, argnums=(0, 3, 4))(m, s, r, o, c)
        return jax.tree.map(lambda x: x.sum(), g)

    out = fwdbwd(means, scales, rots, opac, colors, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fwdbwd(means, scales, rots, opac, colors,
                     jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return WIDTH * HEIGHT / dt, "kernel pixels/s fwd+bwd at 1080p"


def bench_train_step():
    """Full event-mode train step: 3 renders + loss + grads + Adam."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from event3dgs_tpu.core.camera import make_camera, stack_cameras
    from event3dgs_tpu.models import init_from_point_cloud
    from event3dgs_tpu.train import SceneData, init_train_state
    from event3dgs_tpu.train.loop import measure_instance_cap
    from event3dgs_tpu.train.step import make_train_step
    from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

    means, scales, rots, opac, colors = _scene(np, jnp)
    n = N_GAUSSIANS

    cams = [
        make_camera(np.eye(3), np.asarray([0.01 * i, 0.0, 0.02 * i]),
                    1.2, 0.75, WIDTH, HEIGHT)
        for i in range(4)
    ]
    cameras = stack_cameras(cams)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.uniform(0, 1, (4, HEIGHT, WIDTH, 3)), jnp.float32
    )

    params = init_from_point_cloud(means, colors, capacity=n)
    # bench parity with the synthetic scene: keep the generated scales/rots
    params = params.replace(
        scaling=jnp.asarray(np.log(scales), jnp.float32),
        rotation=jnp.asarray(rots, jnp.float32),
        opacity=jnp.asarray(
            np.log(opac / (1 - opac))[:, None], jnp.float32
        ),
    )
    state = init_train_state(params, spatial_lr_scale=3.0)
    data = SceneData(cameras=cameras, images=images,
                     event_cameras=cameras, event_images=images)

    icap = measure_instance_cap(state.params, cameras)
    step = make_train_step(
        "event", OptimizationConfig(), EventConfig(),
        spatial_lr_scale=3.0, rasterizer="tiled", instance_cap=icap,
    )

    bg = jnp.zeros(3)
    i0, i1, i2 = (jnp.asarray(v) for v in (1, 1, 2))
    state, _ = step(state, data, i0, i1, i2, bg)  # compile + warm
    jax.block_until_ready(state.params.xyz)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        # state evolves every call -> inputs never bitwise-repeat
        state, metrics = step(state, data, i0, i1, i2, bg)
    jax.block_until_ready(state.params.xyz)
    dt = (time.perf_counter() - t0) / ITERS
    # 3 differentiable renders per step (main + now + next)
    return 3 * WIDTH * HEIGHT / dt, "train-step pixels/s at 1080p (3 renders/step)"


def main():
    if KERNEL_ONLY:
        pix_s, metric = bench_kernel()
    else:
        pix_s, metric = bench_train_step()
    print(json.dumps({
        "metric": metric,
        "value": round(pix_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_s / CUDA_BASELINE_PIX_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
