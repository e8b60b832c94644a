#!/usr/bin/env python
"""Split the current (instance-major) reduce chain into stages."""
import time
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (PACK_ROWS, bin_gaussians,
                                       pack_instances, tile_grid)
from event3dgs_tpu.ops import rasterize_tiled as rt
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges, exclusive_prefix_rows

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

@jax.jit
def residuals(m, s, r, o, c):
    p = project_gaussians(m, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b, packed

b, packed = residuals(means, scales, rots, opac, colors)
padded_cap = packed.shape[1]
gp = jnp.asarray(rng.normal(size=(padded_cap, PACK_ROWS)), jnp.float32)

def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms")

@jax.jit
def scan_only(gpk, ro, eps):
    e, tot = exclusive_prefix_rows(gpk + eps, interp, n_live=ro[-1])
    return e[-1].sum() + tot.sum()

@jax.jit
def take_scan(gpk, dest, ro, eps):
    g_exp = jnp.take(gpk + eps, dest, axis=0, mode="fill", fill_value=0.0)
    e, tot = exclusive_prefix_rows(g_exp, interp, n_live=ro[-1])
    return e[-1].sum() + tot.sum()

@jax.jit
def take_seg(gpk, dest, ro, eps):
    g_exp = jnp.take(gpk + eps, dest, axis=0, mode="fill", fill_value=0.0)
    s = segment_sums_from_ranges(g_exp, ro[:-1], ro[1:], interp, n_live=ro[-1])
    return s.sum()

@jax.jit
def full(gpk, dest, ro, order, eps):
    g_exp = jnp.take(gpk + eps, dest, axis=0, mode="fill", fill_value=0.0)
    s = segment_sums_from_ranges(g_exp, ro[:-1], ro[1:], interp, n_live=ro[-1])
    gsum = jnp.zeros((N, PACK_ROWS), jnp.float32).at[order].set(s, mode="drop")
    return gsum.sum()

timed("scan only (no gather), 16w dyn", scan_only, gp, b.rank_offsets)
timed("take + scan", take_scan, gp, b.dest_exp, b.rank_offsets)
timed("take + seg-sums (adds boundary gathers)", take_seg, gp, b.dest_exp, b.rank_offsets)
timed("full (+unrank scatter)", full, gp, b.dest_exp, b.rank_offsets, b.order)
