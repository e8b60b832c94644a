#!/usr/bin/env python
"""Stage-by-stage profile of the bench hot path on the current device."""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import bin_gaussians, pack_instances
from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = 5

cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
rng = np.random.default_rng(0)
means = jnp.asarray(np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                          rng.uniform(2, 10, N)], jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(np.log(0.005), np.log(0.03), (N, 1)))
                     * rng.uniform(0.7, 1.4, (N, 3)), jnp.float32)
rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, N), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
bg = jnp.zeros(3)
icap = 8 * N
interp = jax.default_backend() != "tpu"


def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def proj_only(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    return jax.tree.map(lambda x: x.sum(), p)


@jax.jit
def proj_bin(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid,
                      W, H, icap, 128)
    return jax.tree.map(
        lambda x: x.sum() if hasattr(x, 'sum') else 0, b)


@jax.jit
def fwd_only(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    img = rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                          interpret=interp)
    return jnp.sum(img * img)


@jax.jit
def fwdbwd(m, s, r, o, c, eps):
    def loss(m, s, r, o, c):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        img = rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                              interpret=interp)
        return jnp.sum(img * img)
    g = jax.grad(loss, argnums=(0, 3, 4))(m, s, r, o, c)
    return jax.tree.map(lambda x: x.sum(), g)


t_p = timed("projection", proj_only, means, scales, rots, opac)
t_b = timed("projection+binning", proj_bin, means, scales, rots, opac)
t_f = timed("proj+bin+forward", fwd_only, means, scales, rots, opac, colors)
t_a = timed("full fwd+bwd", fwdbwd, means, scales, rots, opac, colors)
print(f"\nbinning alone ~{(t_b-t_p)*1e3:.2f} ms, forward ~{(t_f-t_b)*1e3:.2f}"
      f" ms, backward(+rebin) ~{(t_a-t_f)*1e3:.2f} ms")
print(f"pixels/s fwd+bwd: {W*H/t_a/1e6:.1f} M")

from event3dgs_tpu.ops.binning import PACK_ROWS

@jax.jit
def bin_pack_fwd(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, 128)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b.tile_offsets.sum() + b.chunk_group.sum() + packed.sum()

@jax.jit
def bin_pack_res(m, s, r, o, c, eps):
    # everything the bwd residuals need too
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, 128)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return (b.tile_offsets.sum() + b.chunk_group.sum() + packed.sum()
            + b.dest_exp.sum() + b.rank_offsets.sum() + b.order.sum())

t1 = timed("proj+bin+pack (fwd view)", bin_pack_fwd, means, scales, rots, opac, colors)
t2 = timed("proj+bin+pack (res view)", bin_pack_res, means, scales, rots, opac, colors)
