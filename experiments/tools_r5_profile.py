#!/usr/bin/env python
"""R5 per-stage profile at the EXACT bench shape (scene, instance cap).

Within-process, order-stable subtractive attribution: each timed program
extends the previous one by one pipeline stage, so deltas attribute cost
per stage.  Kernel-isolated timings feed precomputed binning outputs so
the compositing kernels are measured alone.

Env: BENCH_GAUSSIANS (default 100k), ITERS (default 8), CAP (default:
measured live count * 1.3, the bench's measure_instance_cap policy).
"""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from bench import _scene
from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (
    bin_gaussians, pack_instances, count_instances, suggest_instance_cap,
    PACK_ROWS, GROUP, cdiv, tile_grid,
)
from event3dgs_tpu.ops import rasterize_tiled as rt
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges
from jax.experimental import pallas as pl

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 8))
CHUNK = 128

cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
means, scales, rots, opac, colors = map(
    lambda a: jnp.asarray(a, jnp.float32), _scene(np, jnp))
bg = jnp.zeros(3)
interp = jax.default_backend() != "tpu"


def timed(name, fn, *args, iters=ITERS):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def _count(m, s, r, o):
    p = project_gaussians(m, s, r, cam, opacities=o)
    return count_instances(p.mean2d, p.radius, p.valid, W, H,
                           conic=p.conic, opacities=o)

live_total = int(_count(means, scales, rots, opac))
icap = int(os.environ.get("CAP", 0)) or suggest_instance_cap(live_total)
icap = -(-icap // 1024) * 1024
tiles_x, tiles_y = tile_grid(W, H)
n_groups = cdiv(tiles_x * tiles_y, GROUP)
padded_cap = icap + n_groups * CHUNK
print(f"live instances {live_total}, cap {icap}, padded {padded_cap}, "
      f"chunks {padded_cap // CHUNK}")

# ---------------- stage chain ----------------

@jax.jit
def s_proj(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    return jax.tree.map(lambda x: x.sum(), p)


@jax.jit
def s_bin(m, s, r, o, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap,
                      CHUNK, opacities=o, conic=p.conic)
    return b.overflow + b.inst_gauss.sum() + b.chunk_live.sum()


@jax.jit
def s_pack(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap,
                      CHUNK, opacities=o, conic=p.conic)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return packed.sum()


@jax.jit
def s_fwd(m, s, r, o, c, eps):
    p = project_gaussians(m + eps, s, r, cam, opacities=o)
    img = rt.rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                             interpret=interp)
    return img.sum()


@jax.jit
def s_fwdbwd(m, s, r, o, c, eps):
    def loss(m, s, r, o, c):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        img = rt.rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                                 interpret=interp)
        return jnp.sum(img * img)
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m, s, r, o, c)
    return jax.tree.map(lambda x: x.sum(), g)


# ---------------- kernel-isolated ----------------
# precompute binning + packed slab once, feed as device arrays

@jax.jit
def _prep(m, s, r, o, c):
    p = project_gaussians(m, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap,
                      CHUNK, opacities=o, conic=p.conic)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b.chunk_group, b.chunk_live, b.n_used_chunks, packed, \
        b.dest_exp, b.rank_offsets, b.order

chunk_group, chunk_live, nu_dyn, packed, dest_exp, rank_offsets, order = \
    jax.block_until_ready(_prep(means, scales, rots, opac, colors))
total_chunks = padded_cap // CHUNK
nu = jnp.full((1,), total_chunks, jnp.int32)

fwd_kernel = rt._make_fwd_kernel(CHUNK, total_chunks)
bwd_kernel = rt._make_bwd_kernel(CHUNK, total_chunks)
fwd_spec, bwd_spec = rt.build_grid_specs(CHUNK, total_chunks, total_chunks)
_Q = rt._Q


@jax.jit
def k_fwd(cg, cl, packed, eps):
    rgb, logt, work = pl.pallas_call(
        fwd_kernel, grid_spec=fwd_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, n_groups * GROUP, _Q), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * GROUP, _Q), jnp.float32),
            jax.ShapeDtypeStruct((total_chunks,), jnp.int32),
        ],
        interpret=interp,
    )(cg, cl, nu, packed + eps * 1e-9)
    return rgb.sum() + logt.sum(), work


(_, work) = jax.block_until_ready(k_fwd(chunk_group, chunk_live, packed,
                                        jnp.float32(0.0)))
g_rgb = jnp.ones((3, n_groups * GROUP, _Q), jnp.float32)
g_logt = jnp.ones((n_groups * GROUP, _Q), jnp.float32)
logt_save = jnp.zeros((n_groups * GROUP, _Q), jnp.float32)


@jax.jit
def k_bwd(cg, work, packed, grgb, glogt, logt, eps):
    gpacked = pl.pallas_call(
        bwd_kernel, grid_spec=bwd_spec,
        out_shape=[
            jax.ShapeDtypeStruct((padded_cap, PACK_ROWS), jnp.float32),
        ],
        interpret=interp,
    )(cg, work, nu, packed + eps * 1e-9, grgb, glogt, logt)[0]
    return gpacked.sum()


@jax.jit
def k_reduce(gpacked, dest_exp, rank_offsets, order, eps):
    g_exp = jnp.take(gpacked + eps, dest_exp, axis=0, mode="fill",
                     fill_value=0.0)
    sums_rank = segment_sums_from_ranges(
        g_exp, rank_offsets[:-1], rank_offsets[1:], interp,
        n_live=rank_offsets[-1], adjacent=True)
    gsum = (jnp.zeros((N, PACK_ROWS), jnp.float32).at[order]
            .set(sums_rank, mode="drop"))
    return gsum.sum()

gpacked_const = jnp.ones((padded_cap, PACK_ROWS), jnp.float32)

print("--- pipeline chain (deltas attribute stages) ---")
t_proj = timed("projection", s_proj, means, scales, rots, opac)
t_bin = timed("proj+bin", s_bin, means, scales, rots, opac)
t_pack = timed("proj+bin+pack", s_pack, means, scales, rots, opac, colors)
t_fwd = timed("render fwd (full)", s_fwd, means, scales, rots, opac, colors)
t_fb = timed("render fwd+bwd (full)", s_fwdbwd, means, scales, rots, opac,
             colors)
print("--- kernel-isolated ---")
t_kf = timed("fwd compositing kernel", k_fwd, chunk_group, chunk_live, packed)
t_kb = timed("bwd compositing kernel", k_bwd, chunk_group, work, packed,
             g_rgb, g_logt, logt_save)
t_kr = timed("grad reduce", k_reduce, gpacked_const, dest_exp, rank_offsets,
             order)
print("--- attribution ---")
print(f"binning        {1e3*(t_bin - t_proj):8.2f} ms")
print(f"pack           {1e3*(t_pack - t_bin):8.2f} ms")
print(f"fwd kernel     {1e3*(t_fwd - t_pack):8.2f} ms (chain) "
      f"/ {1e3*t_kf:8.2f} ms (isolated)")
print(f"bwd total      {1e3*(t_fb - t_fwd):8.2f} ms (chain); "
      f"kernel {1e3*t_kb:.2f} + reduce {1e3*t_kr:.2f} isolated")
print(f"fwd+bwd total  {1e3*t_fb:8.2f} ms  "
      f"({W*H/t_fb/1e6:.1f} Mpix/s one render)")
