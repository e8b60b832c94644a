import os, time
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

N = 100_000
W, H = 1920, 1080
ITERS = 10
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
icap = -(-8 * N // 1024) * 1024
interp = jax.default_backend() != "tpu"

tiles_x, tiles_y = tile_grid(W, H)
n_groups = -(-(tiles_x * tiles_y) // rt.GROUP)
padded_cap = icap + n_groups * CHUNK
total_chunks = padded_cap // CHUNK

fwd_kernel = rt._make_fwd_kernel(CHUNK, total_chunks)
bwd_kernel = rt._make_bwd_kernel(CHUNK, total_chunks)
fwd_grid_spec, bwd_grid_spec = rt.build_grid_specs(CHUNK, total_chunks)

@jax.jit
def residuals(m, s, r, o, c):
    p = project_gaussians(m, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b, packed

b, packed = residuals(means, scales, rots, opac, colors)

def fwd_call(ct, live, pk):
    return pl.pallas_call(
        fwd_kernel, grid_spec=fwd_grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3, n_groups * rt.GROUP, rt._Q), jnp.float32),
                   jax.ShapeDtypeStruct((n_groups * rt.GROUP, rt._Q), jnp.float32),
                   jax.ShapeDtypeStruct((total_chunks,), jnp.int32)],
        interpret=interp)(ct, live, pk)

@jax.jit
def fwd_scalar(ct, live, pk, eps):
    rgb, logt, work = fwd_call(ct, live, pk + eps)
    return rgb.sum() + logt.sum() + work.sum()

@jax.jit
def fwd_full(ct, live, pk, eps):
    return fwd_call(ct, live, pk + eps)

rgb, logt, work = fwd_full(b.chunk_group, b.chunk_live, packed, jnp.float32(0.))
g_rgb = rgb * 2.0
g_logt = logt * 0.1

def bwd_call(ct, wk, pk, gr, gl, lt):
    return pl.pallas_call(
        bwd_kernel, grid_spec=bwd_grid_spec,
        out_shape=[jax.ShapeDtypeStruct((PACK_ROWS, padded_cap), jnp.float32)],
        interpret=interp)(ct, wk, pk, gr, gl, lt)[0]

@jax.jit
def bwd_scalar(ct, wk, pk, gr, gl, lt, eps):
    return bwd_call(ct, wk, pk + eps, gr, gl, lt).sum()

gpacked = bwd_call(b.chunk_group, work, packed, g_rgb, g_logt, logt)

@jax.jit
def reduce_scalar(gp, dest, ro, order, eps):
    gpt = jax.lax.optimization_barrier((gp + eps)[:9].T)
    g_exp = jnp.take(gpt, dest, axis=0, mode="fill", fill_value=0.0)
    s = segment_sums_from_ranges(g_exp, ro[:-1], ro[1:], interp, n_live=ro[-1])
    gsum = jnp.zeros((N, 9), jnp.float32).at[order].set(s, mode="drop")
    return gsum.sum()

def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt

timed("fwd kernel (scalar out)", fwd_scalar, b.chunk_group, b.chunk_live, packed)
timed("bwd kernel (scalar out)", bwd_scalar, b.chunk_group, work, packed, g_rgb, g_logt, logt)
timed("grad reduce (scalar out)", reduce_scalar, gpacked, b.dest_exp, b.rank_offsets, b.order)
