#!/usr/bin/env python
"""TPU hardware verification: tiled rasterizer fwd+grads vs the jnp oracle.

Runs on the real chip (no interpret mode) with a mid-size scene; checks the
rendered image and every parameter gradient allclose against
``rasterize_reference`` (the slow oracle differentiated by JAX autodiff).
"""
import sys
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops import project_gaussians, rasterize_reference
from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled


def main():
    w, h, n = 384, 128, 1200
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, w, h)
    rng = np.random.default_rng(7)
    means = jnp.asarray(np.c_[rng.uniform(-1.4, 1.4, n),
                              rng.uniform(-0.6, 0.6, n),
                              rng.uniform(2.0, 8.0, n)], jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(np.log(0.01), np.log(0.12), (n, 1)))
                         * rng.uniform(0.7, 1.4, (n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)

    def loss(raster, m, s, r, o, c):
        p = project_gaussians(m, s, r, cam, opacities=o)
        if raster == "ref":
            img = rasterize_reference(p, c, o, bg, w, h)
        else:
            img = rasterize_tiled(p, c, o, bg, w, h)
        return jnp.sum((img - tgt) ** 2), img

    gref = jax.jit(jax.grad(lambda *a: loss("ref", *a)[0], argnums=(0, 1, 2, 3, 4)))
    gfast = jax.jit(jax.grad(lambda *a: loss("fast", *a)[0], argnums=(0, 1, 2, 3, 4)))
    iref = jax.jit(lambda *a: loss("ref", *a)[1])
    ifast = jax.jit(lambda *a: loss("fast", *a)[1])

    args = (means, scales, rots, opac, colors)
    ir, if_ = np.array(iref(*args)), np.array(ifast(*args))
    np.testing.assert_allclose(if_, ir, atol=2e-3, rtol=1e-3)
    print("forward image allclose OK  (max abs diff %.2e)" % np.abs(if_ - ir).max())

    gr, gf = gref(*args), gfast(*args)
    names = ["means", "scales", "rots", "opac", "colors"]
    ok = True
    # TPU transcendental approximations flip a sparse handful of gaussians
    # across the alpha cutoffs (0.99 clamp, 1/255 skip) relative to the
    # oracle; check the bulk (p99) tightly and bound the sparse tail.
    for nm, a, b in zip(names, gr, gf):
        a, b = np.array(a), np.array(b)
        scale = np.abs(a).max() + 1e-8
        d = np.abs(a - b) / scale
        p99, mx = np.percentile(d, 99.0), d.max()
        print(f"grad {nm:7s} rel-diff p99 {p99:.2e} max {mx:.2e}")
        if p99 > 5e-3 or mx > 0.1:
            ok = False
    if not ok:
        print("FAIL"); return 1
    print("all gradients allclose OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
