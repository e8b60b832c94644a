"""Pallas instance-expansion kernel for tile binning.

The XLA formulation of instance expansion — `searchsorted` of every instance
id into the per-Gaussian offset table plus half a dozen random gathers —
costs ~120 ms for 800k instances at 1080p (random gathers are serial on
TPU).  This kernel exploits that instances are generated in depth order, so
the source-Gaussian rank is **monotone non-decreasing**: within any block of
1024 consecutive instance ids the rank spans at most 1024 Gaussians.

Per (1024)-instance block:

1. XLA precomputes (cheaply, one `searchsorted` of ~800 block starts) the
   WIN-aligned candidate window start `k_lo` for each block, and whether the
   block's rank span needs the second window (~1/3 of blocks do).
2. The kernel DMAs one (16, WIN) attribute-major slab of depth-ordered
   per-Gaussian data (row 0 = range offsets) and recovers each instance's
   rank as a *two-indicator-difference* one-hot, then gathers all
   attributes with a single transposed one-hot matmul
   ((16, WIN) @ (BLOCK, WIN)ᵀ → (16, BLOCK)) — attributes land as
   **lane-oriented rows**, so every downstream per-instance computation
   (tile id, exact ellipse cull) runs at 8× the lane occupancy of the old
   column formulation and the outputs are written directly as (1, BLOCK)
   row blocks with zero transposes.  The matmul operands are a triple-bf16
   split of the f32 slab (3 one-pass MXU dots; bit-exact — 3×8 mantissa
   bits cover f32's 24, and the one-hot is 0/1, exact in bf16).
3. Outputs per-instance (tile id, source gaussian) as f32 (exact: all
   values < 2²⁴), block-mapped into (n_blocks, 1024) arrays.

Host-side slab prep does ONE wide row gather (`table[order]`, [N, 11]) —
the round-4 version's 12 separate 1-D `src[order]` gathers cost ~10 ms at
N=100k (XLA TPU gathers are ~10 ns/row *regardless of row width*, so
narrow gathers waste the whole row budget); the wide gather plus one small
transpose replaced them for a measured ~4× binning speedup.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from event3dgs_tpu.ops.pallas_util import out_struct, vma_index_map, vma_of

BLOCK = 1024  # instances per grid step (one (1, 1024) lane-oriented row)
WIN = 1024  # candidate window granularity: two adjacent (16, WIN) windows
# cover any block's rank span (≤ BLOCK ranks, ≤ WIN alignment slack) and are
# fetched as ordinary pipelined BlockSpec inputs — consecutive grid steps
# usually revisit the same windows, so the pipeline emitter skips the DMA
ATTR_ROWS = 16

# attribute-major slab rows (_A_OFF2 = offsets shifted by one rank, so the
# kernel's one-hot is a two-indicator difference with no rank arithmetic;
# _A_CA.._A_QT feed the exact per-tile ellipse cull, see binning.EllipseCull)
(_A_OFF, _A_OFF2, _A_G, _A_X0, _A_Y0, _A_RW, _A_MX, _A_MY,
 _A_CA, _A_CB, _A_CC, _A_NBA, _A_NBC, _A_QT) = range(14)

# columns of the pre-sorted per-rank table handed in by binning.py
# (everything after the two offset rows and the G row)
SORTED_COLS = 11  # x0, y0, rw, mx, my, ca, cb, cc, nba, nbc, qthr


def _expand_kernel_factory(tiles_x: int, num_tiles: int, n: int,
                           tile_w: int, tile_h: int):
    def kernel(klo_ref, total_ref, needb_ref, win_a, win_b, tile_ref, g_ref):
        b = pl.program_id(0)
        total = total_ref[0]

        # Dead-block early-out: the instance budget is a static upper bound,
        # but work past the dynamic ``total`` is pure sentinel — skip all
        # math so binning cost scales with the ACTUAL instance count.
        @pl.when(b * BLOCK >= total)
        def _dead():
            tile_ref[...] = jnp.full((8, 128), float(num_tiles), jnp.float32)
            g_ref[...] = jnp.full((8, 128), float(n), jnp.float32)

        @pl.when(b * BLOCK < total)
        def _live():
            # rank recovery + gather for ALL 1024 block instances at once.
            # The one-hot is a *two-indicator difference*: candidate k is
            # hot for instance i iff offs[k] ≤ i < offs[k+1] — no rank
            # count, no cross-lane reduction, no equality pass.
            ic_col = (
                jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) + b * BLOCK
            )
            icf_col = ic_col.astype(jnp.float32)

            def gather_window(s):
                offs_row = s[_A_OFF : _A_OFF + 1, :]  # (1, WIN)
                offs2_row = s[_A_OFF2 : _A_OFF2 + 1, :]
                onehot = (
                    (offs_row <= icf_col).astype(jnp.float32)
                    - (offs2_row <= icf_col).astype(jnp.float32)
                ).astype(jnp.bfloat16)  # (BLOCK, WIN), 0/1 exact
                sh = s.astype(jnp.bfloat16)
                r1 = s - sh.astype(jnp.float32)
                sm = r1.astype(jnp.bfloat16)
                sl = (r1 - sm.astype(jnp.float32)).astype(jnp.bfloat16)
                # transposed gather: (16, WIN) @ (BLOCK, WIN)ᵀ → (16, BLOCK)
                dims = (((1,), (1,)), ((), ()))
                d = lambda m: jax.lax.dot_general(
                    m, onehot, dims, preferred_element_type=jnp.float32
                )
                return d(sh) + d(sm) + d(sl)

            # the second window only matters when this block's rank span
            # crosses the WIN-aligned boundary (~1/3 of blocks at typical
            # rect sizes); its one-hot is all-zero otherwise, so skipping
            # the matmuls is exact.
            a = gather_window(win_a[...])
            a = a + jax.lax.cond(
                needb_ref[b] > 0,
                lambda: gather_window(win_b[...]),
                lambda: jnp.zeros((ATTR_ROWS, BLOCK), jnp.float32),
            )

            # all per-instance math on (1, BLOCK) lane rows
            ic = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + b * BLOCK
            icf = ic.astype(jnp.float32)
            off_g = a[_A_OFF : _A_OFF + 1, :]
            gsel = a[_A_G : _A_G + 1, :]
            x0 = a[_A_X0 : _A_X0 + 1, :]
            y0 = a[_A_Y0 : _A_Y0 + 1, :]
            rw = jnp.maximum(a[_A_RW : _A_RW + 1, :], 1.0)
            j = icf - off_g
            jy = jnp.floor(j / rw)
            jx = j - jy * rw
            txc = x0 + jx
            tyc = y0 + jy
            tile = tyc * float(tiles_x) + txc

            # exact ellipse cull: drop rect tiles where min over the
            # (1 px-expanded) pixel box of Q = dᵀ·conic·d exceeds
            # 2·ln(255·o) — every pixel there has α < 1/255, so the
            # compositing kernels would zero it anyway; output-exact, and
            # tighter than a circle test on anisotropic splats and rect
            # corners (binning.rect_min_q, 4-edge closed form, no divides).
            mx = a[_A_MX : _A_MX + 1, :]
            my = a[_A_MY : _A_MY + 1, :]
            ca = a[_A_CA : _A_CA + 1, :]
            cb = a[_A_CB : _A_CB + 1, :]
            cc = a[_A_CC : _A_CC + 1, :]
            nba = a[_A_NBA : _A_NBA + 1, :]
            nbc = a[_A_NBC : _A_NBC + 1, :]
            qthr = a[_A_QT : _A_QT + 1, :]
            px0 = txc * float(tile_w)
            py0 = tyc * float(tile_h)
            lx = px0 - 1.0 - mx
            hx = px0 + float(tile_w) - mx
            ly = py0 - 1.0 - my
            hy = py0 + float(tile_h) - my
            inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (0.0 <= hy)
            dy_l = jnp.clip(nbc * lx, ly, hy)
            dy_h = jnp.clip(nbc * hx, ly, hy)
            dx_l = jnp.clip(nba * ly, lx, hx)
            dx_h = jnp.clip(nba * hy, lx, hx)
            q_xl = ca * lx * lx + 2.0 * cb * lx * dy_l + cc * dy_l * dy_l
            q_xh = ca * hx * hx + 2.0 * cb * hx * dy_h + cc * dy_h * dy_h
            q_yl = ca * dx_l * dx_l + 2.0 * cb * dx_l * ly + cc * ly * ly
            q_yh = ca * dx_h * dx_h + 2.0 * cb * dx_h * hy + cc * hy * hy
            qmin = jnp.minimum(jnp.minimum(q_xl, q_xh),
                               jnp.minimum(q_yl, q_yh))
            qmin = jnp.where(inside, 0.0, qmin)
            covered = qmin <= qthr

            live = (ic < total) & covered

            def to_block(v):
                # (1, 1024) lane row → (8, 128) output block: 128-aligned
                # lane slices stacked on sublanes (vreg selects, no matmul)
                return jnp.concatenate(
                    [v[:, r * 128 : (r + 1) * 128] for r in range(8)], axis=0
                )

            tile_ref[...] = to_block(jnp.where(live, tile, float(num_tiles)))
            g_ref[...] = to_block(jnp.where(live, gsel, float(n)))

    return kernel


@lru_cache(maxsize=32)
def _build_expand(n_blocks: int, tiles_x: int, num_tiles: int, n: int,
                  n_pad: int, tile_w: int, tile_h: int, interpret: bool,
                  vma: frozenset = frozenset()):
    kernel = _expand_kernel_factory(tiles_x, num_tiles, n, tile_w, tile_h)

    @vma_index_map
    def win_map_a(i, klo, total, needb):
        return (0, klo[i] // WIN)

    @vma_index_map
    def win_map_b(i, klo, total, needb):
        # when the second window is unused, alias it to window A: the
        # repeat DMA is cheap and the kernel's lax.cond never reads it
        return (0, klo[i] // WIN + needb[i])

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((ATTR_ROWS, WIN), win_map_a,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ATTR_ROWS, WIN), win_map_b,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, 128), vma_index_map(lambda i, *_: (i, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), vma_index_map(lambda i, *_: (i, 0)),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            out_struct((n_blocks * 8, 128), jnp.float32, vma),
            out_struct((n_blocks * 8, 128), jnp.float32, vma),
        ],
        interpret=interpret,
    )


def expand_instances(
    offsets: jnp.ndarray,  # [N+1] int instance-range starts (depth order)
    order: jnp.ndarray,  # [N] depth order (gaussian index per rank)
    sorted_cols: jnp.ndarray,  # [N, SORTED_COLS] depth-ordered attributes:
    #   x0, y0, rw, mx, my, ca, cb, cc, nba, nbc, qthr (binning builds this
    #   with ONE wide row gather — see module docstring)
    instance_cap: int,
    tiles_x: int,
    num_tiles: int,
    tile_w: int = 32,
    tile_h: int = 32,
    interpret: bool = False,
):
    """Expand per-Gaussian tile rects into per-instance (tile, gaussian).

    Rect tiles where the minimum of the conic quadratic over the pixel box
    exceeds the alpha threshold are dropped (their alpha is provably
    < 1/255 everywhere — output-exact; see binning.EllipseCull).

    Returns (tile [instance_cap] int32 with `num_tiles` sentinel,
    gauss [instance_cap] int32 with `n` sentinel).
    """
    n = order.shape[0]
    if instance_cap % BLOCK:
        raise ValueError(f"instance_cap must be a multiple of {BLOCK}")
    if sorted_cols.shape != (n, SORTED_COLS):
        raise ValueError(f"sorted_cols must be [N, {SORTED_COLS}], got "
                         f"{sorted_cols.shape}")
    n_blocks = instance_cap // BLOCK
    # room for the B window one WIN past the last possible A window
    n_pad = (-(-(n + 1) // WIN) + 1) * WIN

    # depth-ordered, attribute-major slab (f32-exact integer values)
    big = jnp.float32(3e24)  # > any instance id ⇒ compare always False
    attrs = jnp.zeros((ATTR_ROWS, n_pad), jnp.float32)
    attrs = attrs.at[_A_OFF].set(
        jnp.full((n_pad,), big, jnp.float32).at[: n + 1].set(
            offsets.astype(jnp.float32)
        )
    )
    attrs = attrs.at[_A_OFF2].set(
        jnp.full((n_pad,), big, jnp.float32).at[:n].set(
            offsets[1:].astype(jnp.float32)
        )
    )
    attrs = attrs.at[_A_G, :n].set(order.astype(jnp.float32))
    attrs = attrs.at[_A_X0 : _A_X0 + SORTED_COLS, :n].set(
        sorted_cols.astype(jnp.float32).T
    )

    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLOCK
    grank_start = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right") - 1, 0, n - 1
    ).astype(jnp.int32)
    k_lo = jnp.clip((grank_start // WIN) * WIN, 0, n_pad - 2 * WIN).astype(
        jnp.int32
    )
    total = jnp.minimum(offsets[-1], instance_cap).astype(jnp.int32)
    # last rank a block can touch: its final instance's rank (block end
    # clamped to the live total; empty/dead blocks degenerate harmlessly)
    block_ends = jnp.minimum(block_starts + (BLOCK - 1),
                             jnp.maximum(total - 1, 0))
    grank_end = jnp.clip(
        jnp.searchsorted(offsets, block_ends, side="right") - 1, 0, n - 1
    ).astype(jnp.int32)
    # window B needed iff the block's rank span (incl. the +1 OFF2 row read
    # at grank_end) leaves window A
    need_b = (grank_end + 1 >= k_lo + WIN).astype(jnp.int32)

    fn = _build_expand(n_blocks, tiles_x, num_tiles, n, n_pad, tile_w,
                       tile_h, interpret, vma_of(attrs))
    tile_f, g_f = fn(k_lo, total[None], need_b, attrs, attrs)
    return (
        tile_f.reshape(-1).astype(jnp.int32),
        g_f.reshape(-1).astype(jnp.int32),
    )
