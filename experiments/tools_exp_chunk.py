"""Chunk-size sweep for the tiled rasterizer (PROFILE_r2 attack list #3).

Times fwd-only and fwd+bwd at 1080p/100k gaussians for chunk sizes 128/256
(the packed-slab lane width of the compositing kernels).  Larger chunks
halve the grid steps and one-hot/segmented-matmul count per instance but
quadruple the (chunk, chunk) segmented-scan mask cost — this measures where
the knee sits on real hardware.

Run on TPU: python experiments/tools_exp_chunk.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.binning import count_instances, suggest_instance_cap
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled

W, H, N, ITERS = 1920, 1080, 100_000, 5


def main():
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
    rng = np.random.default_rng(0)
    means = jnp.asarray(np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                              rng.uniform(2, 10, N)], jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.005), np.log(0.03), (N, 1)))
        * rng.uniform(0.7, 1.4, (N, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, N), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    bg = jnp.zeros(3)

    @jax.jit
    def _count(m, s, r, o):
        p = project_gaussians(m, s, r, cam, opacities=o)
        return count_instances(p.mean2d, p.radius, p.valid, W, H)

    icap = suggest_instance_cap(int(_count(means, scales, rots, opac)))

    import os
    order = (256, 128, 256, 128) if os.environ.get('REV') else (128, 256)
    for chunk in order:
        @jax.jit
        def fwd(m, s, r, o, c, eps, chunk=chunk):
            p = project_gaussians(m + eps, s, r, cam, opacities=o)
            return rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                                   chunk=chunk).sum()

        @jax.jit
        def fwdbwd(m, s, r, o, c, eps, chunk=chunk):
            def loss(m, s, r, o, c):
                p = project_gaussians(m + eps, s, r, cam, opacities=o)
                img = rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                                      chunk=chunk)
                return jnp.sum(img * img)
            g = jax.grad(loss, argnums=(0, 3, 4))(m, s, r, o, c)
            return jax.tree.map(lambda x: x.sum(), g)

        for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            out = fn(means, scales, rots, opac, colors, jnp.float32(0.0))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = fn(means, scales, rots, opac, colors,
                         jnp.float32(1e-6 * (i + 1)))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"chunk={chunk:3d} {name:7s}: {dt*1e3:7.2f} ms  "
                  f"({W*H/dt/1e6:6.1f} Mpix/s)")


if __name__ == "__main__":
    main()
