#!/usr/bin/env python
"""Micro-profile the gradient-reduce chain: transpose / gather / scan / unrank."""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from event3dgs_tpu.ops.segscan import segment_sums_from_ranges, exclusive_prefix_rows

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
CAP = -(-8 * N // 1024) * 1024 + 255 * 128  # padded_cap at 1080p
ITERS = int(os.environ.get("ITERS", 10))
interp = jax.default_backend() != "tpu"

rng = np.random.default_rng(0)
gpacked = jnp.asarray(rng.normal(size=(16, CAP)), jnp.float32)
# realistic bookkeeping: ~290k live instances in both orders
n_live = 290_000
dest_exp = jnp.asarray(
    np.where(np.arange(CAP - 255 * 128) < n_live,
             rng.permutation(CAP)[: CAP - 255 * 128], CAP), jnp.int32)
counts = rng.integers(0, 6, N)
offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
rank_offsets = jnp.asarray(np.minimum(offs, n_live), jnp.int32)
order = jnp.asarray(rng.permutation(N), jnp.int32)


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
def t_transpose(gp, eps):
    return jax.lax.optimization_barrier((gp + eps)[:9].T).sum()


@jax.jit
def t_gather(gp, dest, eps):
    gpt = jax.lax.optimization_barrier((gp + eps)[:9].T)
    return jnp.take(gpt, dest, axis=0, mode="fill", fill_value=0.0).sum()


@jax.jit
def t_scan(gp, dest, ro, eps):
    gpt = jax.lax.optimization_barrier((gp + eps)[:9].T)
    g_exp = jnp.take(gpt, dest, axis=0, mode="fill", fill_value=0.0)
    s = segment_sums_from_ranges(g_exp, ro[:-1], ro[1:], interp,
                                 n_live=ro[-1])
    return s.sum()


@jax.jit
def t_full(gp, dest, ro, order, eps):
    gpt = jax.lax.optimization_barrier((gp + eps)[:9].T)
    g_exp = jnp.take(gpt, dest, axis=0, mode="fill", fill_value=0.0)
    s = segment_sums_from_ranges(g_exp, ro[:-1], ro[1:], interp,
                                 n_live=ro[-1])
    gsum = jnp.zeros((N, 9), jnp.float32).at[order].set(s, mode="drop")
    return gsum.sum()


@jax.jit
def t_scan_only(x, eps):
    e, tot = exclusive_prefix_rows(x + eps, interp)
    return e.sum() + tot.sum()


x_exp = jnp.asarray(rng.normal(size=(CAP - 255 * 128, 9)), jnp.float32)

timed("transpose [9,cap]->[cap,9]", t_transpose, gpacked)
timed("transpose+take(dest_exp)", t_gather, gpacked, dest_exp)
timed("transpose+take+segscan", t_scan, gpacked, dest_exp, rank_offsets)
timed("full reduce (+unrank scatter)", t_full, gpacked, dest_exp,
      rank_offsets, order)
timed("prefix scan alone [icap,9]", t_scan_only, x_exp)
