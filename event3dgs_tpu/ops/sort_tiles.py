"""Pallas counting sort for tile binning.

XLA's comparator sort on TPU takes ~150 ms for the ~1M instance keys of a
1080p frame — two orders of magnitude more than every other stage of the
rasterizer combined.  Tile ids are small integers, so a two-pass counting
sort maps perfectly onto the hardware:

1. **Histogram kernel**: chunks of ids are one-hot expanded against the tile
   lane-axis and column-summed into a persistent VMEM accumulator.
2. (tiny XLA glue: exclusive cumsum of the chunk-padded counts → offsets)
3. **Rank kernel**: per chunk, the *stable within-tile rank* of each id is
   the strictly-lower-triangular matmul of the one-hot matrix — an MXU op —
   plus a carried per-tile count; the destination slot is then
   ``offset[tile] + rank``.

Each grid step consumes an (8, K) block of ids (blocks must be (8, 128)
tile-able) and sweeps its 8 rows in order, so stability holds across rows.
Everything stays in f32 (exact for the integer ranges involved: ids and
destinations < 2²⁴) and uses only Mosaic-lowerable ops (broadcast compares,
matmuls, row/col reductions, identity-matmul transposes).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SORT_CHUNK = 128  # ids per row (K); a block is (8, K) = 1024 ids
BLOCK_ROWS = 8
F32_EXACT = 1 << 24  # max integer exactly representable in f32


def _iota_row(n):
    # tpu.iota only produces integers; cast afterwards
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)


def _mxu_t(x):
    """(a, b) → (b, a) via identity matmul (no vector transpose in Mosaic)."""
    b = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = (r == c).astype(x.dtype)
    # HIGHEST: default MXU precision rounds inputs to bf16, corrupting
    # integer ids > 256; HIGHEST is f32-exact for integers < 2²⁴
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _hist_kernel_factory(n_bins: int):
    def kernel(ids_ref, counts_ref, acc):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        total = acc[...]
        for r in range(BLOCK_ROWS):
            ids_col = _mxu_t(ids_ref[r : r + 1, :])  # (K, 1)
            onehot = (ids_col == _iota_row(n_bins)).astype(jnp.float32)
            total = total + jnp.sum(onehot, axis=0, keepdims=True)
        acc[...] = total

        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            counts_ref[...] = acc[...]

    return kernel


def _rank_kernel_factory(n_bins: int, k: int):
    def kernel(ids_ref, offs_ref, dest_ref, carry):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        l_strict = (cols < rows).astype(jnp.float32)
        offs = offs_ref[...]
        cur = carry[...]
        for r in range(BLOCK_ROWS):
            ids_col = _mxu_t(ids_ref[r : r + 1, :])  # (K, 1)
            onehot = (ids_col == _iota_row(n_bins)).astype(jnp.float32)
            # strictly-lower-triangular matmul = exclusive within-row rank
            cum_excl = jax.lax.dot(
                l_strict, onehot, preferred_element_type=jnp.float32
            )
            withc = cum_excl + cur
            rank_col = jnp.sum(withc * onehot, axis=1, keepdims=True)  # (K,1)
            off_col = jnp.sum(offs * onehot, axis=1, keepdims=True)
            dest_ref[r : r + 1, :] = _mxu_t(rank_col + off_col)  # (1, K)
            cur = cur + jnp.sum(onehot, axis=0, keepdims=True)
        carry[...] = cur

    return kernel


@lru_cache(maxsize=32)
def _build_sort(n_ids: int, n_bins: int, interpret: bool):
    k = SORT_CHUNK
    block = BLOCK_ROWS * k
    assert n_ids % block == 0
    n_chunks = n_ids // block

    hist = pl.pallas_call(
        _hist_kernel_factory(n_bins),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_bins), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n_bins), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )

    rank = pl.pallas_call(
        _rank_kernel_factory(n_bins, k),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * BLOCK_ROWS, k), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((1, n_bins), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    return hist, rank


def counting_sort_buckets(
    ids: jnp.ndarray,  # [I] int32 bucket ids in [0, n_buckets]; n_buckets = drop
    n_buckets: int,
    interpret: bool = False,
):
    """Histogram + stable destination slots for a bucket (counting) sort.

    Args:
        ids: [I] int32; the value ``n_buckets`` is the drop sentinel.
        n_buckets: number of real buckets.

    Returns:
        counts: [n_buckets] int32 per-bucket totals.
        dest builder: call ``dest(offsets, drop_dest)`` with [n_buckets]
        int32 slot offsets to get the stable destination of every id
        (sentinel ids land at ``drop_dest`` + rank, i.e. out of range).
    """
    i = ids.shape[0]
    block = BLOCK_ROWS * SORT_CHUNK
    n_pad = (-i) % block
    ids_p = jnp.pad(ids, (0, n_pad), constant_values=n_buckets)
    n_bins = -(-(n_buckets + 1) // 128) * 128  # +1 sentinel bin, lane-padded
    if i + n_pad >= F32_EXACT or n_bins >= F32_EXACT:
        raise ValueError("counting sort exceeds f32-exact integer range")
    hist, rank = _build_sort(i + n_pad, n_bins, interpret)

    ids2d = ids_p.astype(jnp.float32).reshape(-1, SORT_CHUNK)
    counts = hist(ids2d)[0]

    def dest(offsets, drop_dest):
        offs = jnp.full((1, n_bins), drop_dest, jnp.float32)
        offs = offs.at[0, :n_buckets].set(offsets.astype(jnp.float32))
        d = rank(ids2d, offs)
        return d.reshape(-1)[:i].astype(jnp.int32)

    return counts[:n_buckets].astype(jnp.int32), dest
