"""Pallas instance-expansion kernel for tile binning.

The XLA formulation of instance expansion — `searchsorted` of every instance
id into the per-Gaussian offset table plus half a dozen random gathers —
costs ~120 ms for 800k instances at 1080p (random gathers are serial on
TPU).  This kernel exploits that instances are generated in depth order, so
the source-Gaussian rank is **monotone non-decreasing**: within any block of
1024 consecutive instance ids the rank spans at most 1024 Gaussians.

Per (8×128)-instance block:

1. XLA precomputes (cheaply, one `searchsorted` of ~800 block starts) the
   128-aligned candidate window start `k_lo` for each block.
2. The kernel DMAs one (16, 1152) attribute-major slab of depth-ordered
   per-Gaussian data (row 0 = range offsets) and, per 128-instance row,
   recovers the rank as a compare-and-rowsum against the candidate offsets,
   then gathers all attributes with a single one-hot × slab MXU matmul —
   no serial memory accesses anywhere.
3. Outputs per-instance (tile id, source gaussian) as f32 (exact: all
   values < 2²⁴), block-mapped into (n_blocks·8, 128) arrays.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024  # instances per grid step (8 sublane rows × 128 lanes)
CAND = 1152  # candidate gaussians per block (9 × 128 ≥ BLOCK + alignment)
ATTR_ROWS = 16

# attribute-major slab rows
_A_OFF, _A_G, _A_X0, _A_Y0, _A_RW = range(5)


def _mxu_t(x):
    b = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = (r == c).astype(x.dtype)
    # HIGHEST: the default MXU path rounds inputs to bf16, corrupting
    # integer values > 256 (tile ids, offsets); HIGHEST is f32-exact < 2²⁴
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _expand_kernel_factory(tiles_x: int, num_tiles: int, n: int):
    def kernel(klo_ref, total_ref, attrs_ref, tile_ref, g_ref, slab, sem):
        b = pl.program_id(0)
        total = total_ref[0]

        # Dead-block early-out: the instance budget is a static upper bound,
        # but work past the dynamic ``total`` is pure sentinel — skip the DMA
        # and all math so binning cost scales with the ACTUAL instance count.
        @pl.when(b * BLOCK >= total)
        def _dead():
            tile_ref[...] = jnp.full((8, 128), float(num_tiles), jnp.float32)
            g_ref[...] = jnp.full((8, 128), float(n), jnp.float32)

        @pl.when(b * BLOCK < total)
        def _live():
            k_lo = pl.multiple_of(klo_ref[b], 128)
            dma = pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(k_lo, CAND)], slab, sem
            )
            dma.start()
            dma.wait()
            s = slab[...]
            offs_row = s[_A_OFF : _A_OFF + 1, :]  # (1, CAND)
            g_row = s[_A_G : _A_G + 1, :]
            x0_row = s[_A_X0 : _A_X0 + 1, :]
            y0_row = s[_A_Y0 : _A_Y0 + 1, :]
            rw_row = s[_A_RW : _A_RW + 1, :]
            cand_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, CAND), 1
            ).astype(jnp.float32)

            tile_rows = []
            g_rows = []
            for r in range(8):
                ibase = (b * 8 + r) * 128
                ic = (
                    jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) + ibase
                )
                icf = ic.astype(jnp.float32)
                cnt = jnp.sum(
                    (offs_row <= icf).astype(jnp.float32), axis=1,
                    keepdims=True,
                )
                grank_rel = jnp.maximum(cnt - 1.0, 0.0)  # (128, 1)
                onehot = (cand_iota == grank_rel).astype(
                    jnp.float32
                )  # (128, CAND)

                # masked-sum gather: exactly one lane is hot per row, so a
                # VPU multiply+row-reduce per attribute is an exact f32
                # gather — ~2.5× cheaper than the 6-pass HIGHEST one-hot
                # matmul it replaces (integer offsets need all 24 mantissa
                # bits, ruling out the bf16 MXU paths).
                def sel(row):
                    return jnp.sum(onehot * row, axis=1, keepdims=True)

                off_g = sel(offs_row)
                gsel = sel(g_row)
                x0 = sel(x0_row)
                y0 = sel(y0_row)
                rw = jnp.maximum(sel(rw_row), 1.0)
                j = icf - off_g
                jy = jnp.floor(j / rw)
                jx = j - jy * rw
                tile = (y0 + jy) * float(tiles_x) + (x0 + jx)
                live = ic < total
                tile = jnp.where(live, tile, float(num_tiles))
                gsel = jnp.where(live, gsel, float(n))
                tile_rows.append(_mxu_t(tile))  # (1, 128)
                g_rows.append(_mxu_t(gsel))
            tile_ref[...] = jnp.concatenate(tile_rows, axis=0)
            g_ref[...] = jnp.concatenate(g_rows, axis=0)

    return kernel


@lru_cache(maxsize=32)
def _build_expand(n_blocks: int, tiles_x: int, num_tiles: int, n: int,
                  n_pad: int, interpret: bool):
    kernel = _expand_kernel_factory(tiles_x, num_tiles, n)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((ATTR_ROWS, CAND), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )


def expand_instances(
    offsets: jnp.ndarray,  # [N+1] int instance-range starts (depth order)
    order: jnp.ndarray,  # [N] depth order (gaussian index per rank)
    x0, y0, rw,  # [N] tile-rect data (UNORDERED, indexed by gaussian)
    instance_cap: int,
    tiles_x: int,
    num_tiles: int,
    interpret: bool = False,
):
    """Expand per-Gaussian tile rects into per-instance (tile, gaussian).

    Returns (tile [instance_cap] int32 with `num_tiles` sentinel,
    gauss [instance_cap] int32 with `n` sentinel).
    """
    n = order.shape[0]
    if instance_cap % BLOCK:
        raise ValueError(f"instance_cap must be a multiple of {BLOCK}")
    n_blocks = instance_cap // BLOCK
    n_pad = (-(n + 1)) % 128 + (n + 1) + CAND

    # depth-ordered, attribute-major slab (f32-exact integer values)
    big = jnp.float32(3e24)  # > any instance id ⇒ compare always False
    offs_row = jnp.full((n_pad,), big, jnp.float32).at[: n + 1].set(
        offsets.astype(jnp.float32)
    )
    def row(src):
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(
            src[order].astype(jnp.float32)
        )

    attrs = jnp.zeros((ATTR_ROWS, n_pad), jnp.float32)
    attrs = attrs.at[_A_OFF].set(offs_row)
    attrs = attrs.at[_A_G].set(
        jnp.zeros((n_pad,), jnp.float32).at[:n].set(order.astype(jnp.float32))
    )
    attrs = attrs.at[_A_X0].set(row(x0))
    attrs = attrs.at[_A_Y0].set(row(y0))
    attrs = attrs.at[_A_RW].set(row(rw))

    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLOCK
    grank_start = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right") - 1, 0, n - 1
    ).astype(jnp.int32)
    k_lo = jnp.clip((grank_start // 128) * 128, 0, n_pad - CAND).astype(
        jnp.int32
    )
    total = jnp.minimum(offsets[-1], instance_cap).astype(jnp.int32)

    fn = _build_expand(n_blocks, tiles_x, num_tiles, n, n_pad, interpret)
    tile_f, g_f = fn(k_lo, total[None], attrs)
    return (
        tile_f.reshape(-1).astype(jnp.int32),
        g_f.reshape(-1).astype(jnp.int32),
    )
