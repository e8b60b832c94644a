"""Pallas counting sort for tile binning.

XLA's comparator sort on TPU takes ~150 ms for the ~1M instance keys of a
1080p frame — two orders of magnitude more than every other stage of the
rasterizer combined.  Tile ids are small integers, so a two-pass counting
sort maps perfectly onto the hardware:

1. **Histogram kernel**: chunks of ids are one-hot expanded against the tile
   lane-axis and column-summed into a persistent VMEM accumulator.
2. (tiny XLA glue: exclusive cumsum of the chunk-padded counts → offsets)
3. **Rank kernel**: per chunk, the *stable within-tile rank* of each id is
   a strictly-lower-triangular **pairwise-equality count** (a (K, K) VPU
   compare + masked row-sum — no MXU matmul needed), plus a carried
   per-tile count; the destination slot is then ``offset[tile] + rank``.

Both kernels take the dynamic live-id count as a scalar-prefetch argument
and skip blocks that are entirely past it, so the sort costs scale with the
ACTUAL instance count rather than the static budget.

Each grid step consumes an (8, K) block of ids (blocks must be (8, 128)
tile-able) and sweeps its 8 rows in order, so stability holds across rows.
Everything stays in f32 (exact for the integer ranges involved: ids and
destinations < 2²⁴) and uses only Mosaic-lowerable ops (broadcast compares,
row/col reductions, identity-matmul transposes).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from event3dgs_tpu.ops.pallas_util import out_struct, vma_index_map, vma_of

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
    def kernel(total_ref, ids_ref, counts_ref, acc):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # blocks entirely past the live count hold only sentinel ids whose
        # counts are never read — skip them
        @pl.when(c * BLOCK_ROWS * SORT_CHUNK < total_ref[0])
        def _live():
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


def _rank_kernel_factory(n_bins: int, k: int, n_buckets: int):
    def kernel(total_ref, ids_ref, offs_ref, dest_ref, carry):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        # sentinel-only block: every destination is the drop slot (read from
        # the sentinel bin of the offsets row); the sentinel bin's carry is
        # never consulted, so skipping its update is safe
        @pl.when(c * BLOCK_ROWS * k >= total_ref[0])
        def _dead():
            dest_ref[...] = jnp.full(
                (BLOCK_ROWS, k), offs_ref[0, n_buckets], jnp.float32
            )

        @pl.when(c * BLOCK_ROWS * k < total_ref[0])
        def _live():
            rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            l_strict = (cols < rows).astype(jnp.float32)
            offs = offs_ref[...]
            cur = carry[...]
            for r in range(BLOCK_ROWS):
                ids_row = ids_ref[r : r + 1, :]  # (1, K)
                ids_col = _mxu_t(ids_row)  # (K, 1)
                onehot = (ids_col == _iota_row(n_bins)).astype(jnp.float32)
                # exclusive within-row rank = # earlier ids equal to mine:
                # pairwise equality masked strictly-lower, row-reduced (VPU)
                eq = (ids_col == ids_row).astype(jnp.float32)  # (K, K)
                rank_col = jnp.sum(eq * l_strict, axis=1, keepdims=True)
                carry_col = jnp.sum(cur * onehot, axis=1, keepdims=True)
                off_col = jnp.sum(offs * onehot, axis=1, keepdims=True)
                dest_ref[r : r + 1, :] = _mxu_t(
                    rank_col + carry_col + off_col
                )  # (1, K)
                cur = cur + jnp.sum(onehot, axis=0, keepdims=True)
            carry[...] = cur

    return kernel


@lru_cache(maxsize=32)
def _build_sort(n_ids: int, n_bins: int, n_buckets: int, interpret: bool,
                vma: frozenset = frozenset()):
    k = SORT_CHUNK
    block = BLOCK_ROWS * k
    assert n_ids % block == 0
    n_chunks = n_ids // block

    hist = pl.pallas_call(
        _hist_kernel_factory(n_bins),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (BLOCK_ROWS, k), vma_index_map(lambda i, *_: (i, 0)),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, n_bins), vma_index_map(lambda i, *_: (0, 0)), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((1, n_bins), jnp.float32)],
        ),
        out_shape=out_struct((1, n_bins), jnp.float32, vma),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )

    rank = pl.pallas_call(
        _rank_kernel_factory(n_bins, k, n_buckets),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (BLOCK_ROWS, k), vma_index_map(lambda i, *_: (i, 0)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_bins), vma_index_map(lambda i, *_: (0, 0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_ROWS, k), vma_index_map(lambda i, *_: (i, 0)),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((1, n_bins), jnp.float32)],
        ),
        out_shape=out_struct((n_chunks * BLOCK_ROWS, k), jnp.float32, vma),
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
    n_live=None,  # optional traced count of live (non-sentinel) ids
):
    """Histogram + stable destination slots for a bucket (counting) sort.

    Args:
        ids: [I] int32; the value ``n_buckets`` is the drop sentinel.
        n_buckets: number of real buckets.
        n_live: optional dynamic count of live ids — every id at index
            ≥ n_live must already be the sentinel; blocks past it are
            skipped entirely.

    Returns:
        counts: [n_buckets] int32 per-bucket totals.
        dest builder: call ``dest(offsets, drop_dest)`` with [n_buckets]
        int32 slot offsets to get the stable destination of every id
        (sentinel ids land at ``drop_dest``, i.e. out of range).
    """
    i = ids.shape[0]
    block = BLOCK_ROWS * SORT_CHUNK
    n_pad = (-i) % block
    ids_p = jnp.pad(ids, (0, n_pad), constant_values=n_buckets)
    n_bins = -(-(n_buckets + 1) // 128) * 128  # +1 sentinel bin, lane-padded
    if i + n_pad >= F32_EXACT or n_bins >= F32_EXACT:
        raise ValueError("counting sort exceeds f32-exact integer range")
    hist, rank = _build_sort(i + n_pad, n_bins, n_buckets, interpret,
                             vma_of(ids))

    if n_live is None:
        n_live = jnp.asarray(i, jnp.int32)
    n_live = jnp.minimum(jnp.asarray(n_live, jnp.int32), i)[None]

    ids2d = ids_p.astype(jnp.float32).reshape(-1, SORT_CHUNK)
    counts = hist(n_live, ids2d)[0]

    def dest(offsets, drop_dest):
        offs = jnp.full((1, n_bins), drop_dest, jnp.float32)
        offs = offs.at[0, :n_buckets].set(offsets.astype(jnp.float32))
        d = rank(n_live, ids2d, offs)
        return d.reshape(-1)[:i].astype(jnp.int32)

    return counts[:n_buckets].astype(jnp.int32), dest
