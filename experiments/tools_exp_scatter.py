"""Scatter-vs-gather for the gradient un-ranking step (reduce chain tail).

The reduce chain ends with `zeros.at[order].set(sums_rank)` — a [N, 16]
row scatter.  The same permutation can be applied as a row GATHER with the
precomputed inverse (`sums_rank[inv]`), plus the cost of building `inv`
(an int argsort or an int scatter, amortizable inside binning where `order`
is produced).  TPU scatters serialize; this measures whether the swap pays
at N=100k.  Interleaved in-process measurement (see PROFILE_r3 measurement
discipline).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

N = 100_000
ITERS = 20

rng = np.random.default_rng(0)
order = jnp.asarray(rng.permutation(N), jnp.int32)
sums = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)


@jax.jit
def via_scatter(order, sums, eps):
    return jnp.zeros((N, 16)).at[order].set(sums + eps).sum()


@jax.jit
def via_gather(order, sums, eps):
    inv = jnp.argsort(order)  # charged to this variant
    return (sums + eps)[inv].sum()


@jax.jit
def via_gather_precomp(inv, sums, eps):
    return (sums + eps)[inv].sum()


def bench(fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


inv = jnp.argsort(order)
for rep in range(2):  # interleave to expose warm-up bias
    print(f"scatter        : {bench(via_scatter, order, sums):6.2f} ms")
    print(f"gather+argsort : {bench(via_gather, order, sums):6.2f} ms")
    print(f"gather precomp : {bench(via_gather_precomp, inv, sums):6.2f} ms")
