"""Measure the gradient-reduce chain's layout overhead.

Hypothesis (PROFILE_r4): every [cap, 16] f32 stage of the backward
gradient reduction — the bwd kernel's output slab, the expansion-order
row gather, the Pallas prefix scan — is (8, 128)-tile padded on TPU, so
its HBM traffic is 8× the useful bytes.  This script times the pieces at
width 16 vs a lane-dense reshape, and prints compiled per-device memory
for both, to decide whether a dense-layout rework pays.

Run on TPU: python experiments/tools_exp_layout.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("CAP", 1 << 21))  # instance cap scale
ITERS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
    x128 = jnp.asarray(rng.normal(size=(N // 8, 128)), jnp.float32)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    @jax.jit
    def gather16(x, p):
        return jnp.take(x, p, axis=0)

    @jax.jit
    def copy16(x):
        return x * 1.0000001

    @jax.jit
    def copy128(x):
        return x * 1.0000001

    print(f"N={N}")
    print("copy [N,16]        ", timeit(copy16, x16), "ms")
    print("copy [N/8,128]     ", timeit(copy128, x128), "ms")
    print("row-gather [N,16]  ", timeit(gather16, x16, perm), "ms")

    from event3dgs_tpu.ops.segscan import exclusive_prefix_rows

    @jax.jit
    def scan16(x):
        return exclusive_prefix_rows(x)[0]

    print("prefix scan [N,16] ", timeit(scan16, x16), "ms")

    # narrow-minor-dim arrays: the projection outputs (mean2d [N,2],
    # conic [N,3]) cross the binning fusion firewall as materialized
    # arrays; if the TPU pads the minor dim to the 128-lane tile, every
    # HBM pass over them costs 64x/42x the useful bytes.
    x2 = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    xf = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    print("copy [N,2]         ", timeit(copy16, x2), "ms")
    print("copy [N,3]         ", timeit(copy16, x3), "ms")
    print("copy [N] flat      ", timeit(copy16, xf), "ms")

    @jax.jit
    def barrier_roundtrip(a):
        b = jax.lax.optimization_barrier(a)
        return jnp.sum(b, axis=-1)

    print("barrier+rowsum [N,2]", timeit(barrier_roundtrip, x2), "ms")

    for shape, arr in (("[N,16]", x16), ("[N/8,128]", x128),
                       ("[N,2]", x2), ("[N,3]", x3), ("[N]", xf)):
        ma = jax.jit(lambda a: a * 2.0).lower(arr).compile().memory_analysis()
        print(f"memory {shape}: arg={ma.argument_size_in_bytes} "
              f"out={ma.output_size_in_bytes} temp={ma.temp_size_in_bytes}")


if __name__ == "__main__":
    main()
