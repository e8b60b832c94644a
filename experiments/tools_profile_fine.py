#!/usr/bin/env python
"""Fine-grained profile: live binning, pack, fwd kernel, bwd kernel, reduce."""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import bin_gaussians, pack_instances, PACK_ROWS
from event3dgs_tpu.ops import rasterize_tiled as rt

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 10))
CHUNK = 128

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
icap = -(-8 * N // 1024) * 1024
interp = jax.default_backend() != "tpu"


def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def s_proj(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    return jax.tree.map(lambda x: x.sum(), p)


@jax.jit
def s_bin_live(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    return b.chunk_group.sum() + b.inst_gauss.sum()


@jax.jit
def s_bin_pack(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b.chunk_group.sum() + packed.sum()


@jax.jit
def s_bin_res(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return (b.chunk_group.sum() + packed.sum() + b.dest_exp.sum()
            + b.rank_offsets.sum() + b.order.sum())


@jax.jit
def s_fwd(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    img = rt.rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                             interpret=interp)
    return jnp.sum(img * img)


@jax.jit
def s_fwdbwd(m, s, r, o, c, eps):
    def loss(m, s, r, o, c):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        img = rt.rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                                 interpret=interp)
        return jnp.sum(img * img)
    g = jax.grad(loss, argnums=(0, 3, 4))(m, s, r, o, c)
    return jax.tree.map(lambda x: x.sum(), g)


t_proj = timed("projection", s_proj, means, scales, rots, opac)
t_binl = timed("proj+bin(live)", s_bin_live, means, scales, rots, opac)
t_bp = timed("proj+bin+pack", s_bin_pack, means, scales, rots, opac, colors)
t_br = timed("proj+bin+pack+residuals", s_bin_res, means, scales, rots, opac,
             colors)
t_f = timed("fwd total", s_fwd, means, scales, rots, opac, colors)
t_fb = timed("fwd+bwd total", s_fwdbwd, means, scales, rots, opac, colors)
print()
print(f"binning(live)      ~{(t_binl-t_proj)*1e3:7.2f} ms")
print(f"pack               ~{(t_bp-t_binl)*1e3:7.2f} ms")
print(f"bwd residual extra ~{(t_br-t_bp)*1e3:7.2f} ms")
print(f"fwd kernel         ~{(t_f-t_bp)*1e3:7.2f} ms")
print(f"bwd (kernel+reduce+proj-vjp) ~{(t_fb-t_f)*1e3:7.2f} ms")
print(f"pixels/s fwd+bwd: {W*H/t_fb/1e6:.1f} M")
