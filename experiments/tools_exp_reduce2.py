#!/usr/bin/env python
"""Reduce-chain experiments with honest (Pallas-consumed) timing."""
import os, time
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import bin_gaussians, pack_instances
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
gp = jnp.asarray(rng.normal(size=packed.shape), jnp.float32)  # fake grads
padded_cap = packed.shape[1]

def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/ITERS*1e3:9.2f} ms")

# scan consumes its input (opaque Pallas) -> honest materialization
@jax.jit
def transpose_scan(gpk, eps):
    gpt = jax.lax.optimization_barrier((gpk + eps)[:9].T)
    e, tot = exclusive_prefix_rows(gpt, interp)
    return e[-1].sum() + tot.sum()

@jax.jit
def gather_scan(gpk, dest, eps):
    gpt = jax.lax.optimization_barrier((gpk + eps)[:9].T)
    g_exp = jnp.take(gpt, dest, axis=0, mode="fill", fill_value=0.0)
    e, tot = exclusive_prefix_rows(g_exp, interp)
    return e[-1].sum() + tot.sum()

@jax.jit
def gather_scan_clip(gpk, dest, eps):
    gpt = jax.lax.optimization_barrier((gpk + eps)[:9].T)
    g_exp = jnp.take(gpt, jnp.minimum(dest, padded_cap - 1), axis=0,
                     mode="clip")
    e, tot = exclusive_prefix_rows(g_exp, interp)
    return e[-1].sum() + tot.sum()

@jax.jit
def scan_only(gpk, eps):
    # no transpose: scan the (16, cap) slab's first 9 rows... needs rows;
    # instead scan a contiguous (cap, 9) reshape-ish view via slicing lanes
    x = (gpk + eps)[:9].reshape(9, -1, 1)[:, :, 0].T  # same transpose, no barrier
    e, tot = exclusive_prefix_rows(x, interp)
    return e[-1].sum() + tot.sum()

timed("transpose + scan (no gather)", transpose_scan, gp)
timed("transpose + take(fill) + scan", gather_scan, gp, b.dest_exp)
timed("transpose + take(clip) + scan", gather_scan_clip, gp, b.dest_exp)
