#!/usr/bin/env python
"""Split the rasterizer backward into kernel / reduction / projection-VJP.

Reuses the library's kernels AND grid specs (rasterize_tiled.build_grid_specs)
so the profile always measures exactly what the production path runs.
"""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (PACK_ROWS, bin_gaussians,
                                       pack_instances, tile_grid, TILE_H,
                                       TILE_W)
from event3dgs_tpu.ops import rasterize_tiled as rt
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges

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
icap = int(os.environ.get("ICAP", 385024))
interp = jax.default_backend() != "tpu"

tiles_x, tiles_y = tile_grid(W, H)
hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
n_groups = -(-(tiles_x * tiles_y) // rt.GROUP)
padded_cap = icap + n_groups * CHUNK
total_chunks = padded_cap // CHUNK

fwd_kernel = rt._make_fwd_kernel(CHUNK, total_chunks)
bwd_kernel = rt._make_bwd_kernel(CHUNK, total_chunks)


# --- precompute residuals once (host-side snapshot) ------------------------
@jax.jit
def residuals(m, s, r, o, c):
    p = project_gaussians(m, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b, packed


b, packed = residuals(means, scales, rots, opac, colors)


@jax.jit
def run_fwd_kernel(ct, live, nu, packed, eps):
    fwd_grid_spec, _ = rt.build_grid_specs(CHUNK, total_chunks,
                                           total_chunks)
    rgb, logt, work = pl.pallas_call(
        fwd_kernel, grid_spec=fwd_grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3, n_groups * rt.GROUP, rt._Q),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_groups * rt.GROUP, rt._Q),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((total_chunks,), jnp.int32)],
        interpret=interp,
    )(ct, live, nu, packed + eps)
    return rgb, logt, work


nu = jnp.full((1,), total_chunks, jnp.int32)
rgb, logt, work = run_fwd_kernel(b.chunk_group, b.chunk_live, nu, packed,
                                 jnp.float32(0.0))
g_rgb = rgb * 2.0
g_logt = logt * 0.1


@jax.jit
def run_bwd_kernel(ct, work, nu, packed, g_rgb, g_logt, logt, eps):
    _, bwd_grid_spec = rt.build_grid_specs(CHUNK, total_chunks,
                                           total_chunks)
    gpacked = pl.pallas_call(
        bwd_kernel, grid_spec=bwd_grid_spec,
        out_shape=[jax.ShapeDtypeStruct((padded_cap, PACK_ROWS), jnp.float32)],
        interpret=interp,
    )(ct, work, nu, packed + eps, g_rgb, g_logt, logt)[0]
    return gpacked


gpacked = run_bwd_kernel(b.chunk_group, work, nu, packed, g_rgb, g_logt, logt,
                         jnp.float32(0.0))


@jax.jit
def run_reduce(gpacked, dest_exp, rank_offsets, order, eps):
    g_exp = jnp.take(gpacked + eps, dest_exp, axis=0, mode="fill",
                     fill_value=0.0)
    sums_rank = segment_sums_from_ranges(
        g_exp, rank_offsets[:-1], rank_offsets[1:], interp,
        n_live=rank_offsets[-1], adjacent=True,
    )
    gsum = jnp.zeros((N, PACK_ROWS), jnp.float32).at[order].set(
        sums_rank, mode="drop")
    return gsum.sum()


def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return dt


timed("fwd kernel alone", run_fwd_kernel, b.chunk_group, b.chunk_live, nu, packed)
timed("bwd kernel alone", run_bwd_kernel, b.chunk_group, work, nu, packed, g_rgb,
      g_logt, logt)
timed("grad reduce alone", run_reduce, gpacked, b.dest_exp, b.rank_offsets,
      b.order)


# projection vjp alone
@jax.jit
def proj_vjp(m, s, r, o, eps):
    def f(m, s, r, o):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        return (p.mean2d.sum() + p.conic.sum() + p.depth.sum()
                + p.radius.sum())
    return jax.grad(f, argnums=(0, 1, 2, 3))(m, s, r, o)


timed("projection vjp alone", proj_vjp, means, scales, rots, opac)
