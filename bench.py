#!/usr/bin/env python
"""Headline benchmark: fwd+bwd rasterizer throughput at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the differentiable-render hot path (projection + binning + tiled
Pallas rasterizer forward + backward, i.e. one training-loss gradient) on a
synthetic 1080p scene, in pixels/second on the current device.  Inputs are
perturbed every iteration — the TPU relay in this environment caches results
for bitwise-identical executions, which would otherwise fake the numbers.

``vs_baseline`` compares against a nominal CUDA-reference training
throughput of 30 Mpix/s fwd+bwd (a typical single-GPU 3DGS training rate:
~15-20 it/s at ~1-2 Mpix with the reference's unbatched loop; the reference
repo itself publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time

CUDA_BASELINE_PIX_S = 30e6

N_GAUSSIANS = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
WIDTH, HEIGHT = 1920, 1080
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from event3dgs_tpu.core import make_camera
    from event3dgs_tpu.ops.projection import project_gaussians
    from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled

    from event3dgs_tpu.ops.binning import count_instances, suggest_instance_cap

    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, WIDTH, HEIGHT)
    rng = np.random.default_rng(0)
    n = N_GAUSSIANS
    means = jnp.asarray(
        np.c_[rng.uniform(-3, 3, n), rng.uniform(-1.8, 1.8, n),
              rng.uniform(2, 10, n)], jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.005), np.log(0.03), (n, 1)))
        * rng.uniform(0.7, 1.4, (n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    bg = jnp.zeros(3)
    # adaptive instance budget, as the training loop sizes it: observed
    # count + 30% margin (the CUDA baseline allocates exactly per frame;
    # our static cap re-jits on overflow — see train/loop capacity growth)
    @jax.jit
    def _count(m, s, r, o):
        from event3dgs_tpu.ops.projection import project_gaussians as pg
        p = pg(m, s, r, cam, opacities=o)
        return count_instances(p.mean2d, p.radius, p.valid, WIDTH, HEIGHT)

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

    pix_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "pixels/s/chip fwd+bwd at 1080p",
        "value": round(pix_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_s / CUDA_BASELINE_PIX_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
