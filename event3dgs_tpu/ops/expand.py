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

from event3dgs_tpu.ops.pallas_util import out_struct, vma_index_map, vma_of

BLOCK = 1024  # instances per grid step (8 sublane rows × 128 lanes)
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


def _expand_kernel_factory(tiles_x: int, num_tiles: int, n: int,
                           tile_w: int, tile_h: int):
    def kernel(klo_ref, total_ref, win_a, win_b, tile_ref, g_ref):
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
            # count, no cross-lane reduction, no equality pass.  ONE
            # HIGHEST matmul per window then pulls every attribute row
            # together ((BLOCK, WIN) @ (WIN, 16), f32-exact below 2²⁴ so
            # integer offsets/ids survive).
            ic = (
                jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) + b * BLOCK
            )
            icf = ic.astype(jnp.float32)

            def gather_window(s):
                offs_row = s[_A_OFF : _A_OFF + 1, :]  # (1, WIN)
                offs2_row = s[_A_OFF2 : _A_OFF2 + 1, :]
                onehot = (offs_row <= icf).astype(jnp.float32) - (
                    offs2_row <= icf
                ).astype(jnp.float32)
                return jax.lax.dot_general(
                    onehot, s, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (BLOCK, ATTR_ROWS)

            a = gather_window(win_a[...]) + gather_window(win_b[...])

            off_g = a[:, _A_OFF : _A_OFF + 1]
            gsel = a[:, _A_G : _A_G + 1]
            x0 = a[:, _A_X0 : _A_X0 + 1]
            y0 = a[:, _A_Y0 : _A_Y0 + 1]
            rw = jnp.maximum(a[:, _A_RW : _A_RW + 1], 1.0)
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
            mx = a[:, _A_MX : _A_MX + 1]
            my = a[:, _A_MY : _A_MY + 1]
            ca = a[:, _A_CA : _A_CA + 1]
            cb = a[:, _A_CB : _A_CB + 1]
            cc = a[:, _A_CC : _A_CC + 1]
            nba = a[:, _A_NBA : _A_NBA + 1]
            nbc = a[:, _A_NBC : _A_NBC + 1]
            qthr = a[:, _A_QT : _A_QT + 1]
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
            tile = jnp.where(live, tile, float(num_tiles))
            gsel = jnp.where(live, gsel, float(n))
            # (BLOCK, 1) columns → (8, 128) output blocks: 128-row slices
            # transposed onto lanes via eye-matmuls
            tile_rows = []
            g_rows = []
            for r in range(8):
                sl = slice(r * 128, (r + 1) * 128)
                tile_rows.append(_mxu_t(tile[sl]))  # (1, 128)
                g_rows.append(_mxu_t(gsel[sl]))
            tile_ref[...] = jnp.concatenate(tile_rows, axis=0)
            g_ref[...] = jnp.concatenate(g_rows, axis=0)

    return kernel


@lru_cache(maxsize=32)
def _build_expand(n_blocks: int, tiles_x: int, num_tiles: int, n: int,
                  n_pad: int, tile_w: int, tile_h: int, interpret: bool,
                  vma: frozenset = frozenset()):
    kernel = _expand_kernel_factory(tiles_x, num_tiles, n, tile_w, tile_h)

    @vma_index_map
    def win_map_a(i, klo, total):
        return (0, klo[i] // WIN)

    @vma_index_map
    def win_map_b(i, klo, total):
        return (0, klo[i] // WIN + 1)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
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
    x0, y0, rw,  # [N] tile-rect data (UNORDERED, indexed by gaussian)
    mean2d: jnp.ndarray,  # [N, 2] screen-space means (for coverage cull)
    ell,  # binning.EllipseCull: exact per-tile alpha-cull data
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
    n_blocks = instance_cap // BLOCK
    # room for the B window one WIN past the last possible A window
    n_pad = (-(-(n + 1) // WIN) + 1) * WIN

    # depth-ordered, attribute-major slab (f32-exact integer values)
    big = jnp.float32(3e24)  # > any instance id ⇒ compare always False
    offs_row = jnp.full((n_pad,), big, jnp.float32).at[: n + 1].set(
        offsets.astype(jnp.float32)
    )
    def row(src):
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(
            src[order].astype(jnp.float32)
        )

    offs2_row = jnp.full((n_pad,), big, jnp.float32).at[:n].set(
        offsets[1:].astype(jnp.float32)
    )
    attrs = jnp.zeros((ATTR_ROWS, n_pad), jnp.float32)
    attrs = attrs.at[_A_OFF].set(offs_row)
    attrs = attrs.at[_A_OFF2].set(offs2_row)
    attrs = attrs.at[_A_G].set(
        jnp.zeros((n_pad,), jnp.float32).at[:n].set(order.astype(jnp.float32))
    )
    attrs = attrs.at[_A_X0].set(row(x0))
    attrs = attrs.at[_A_Y0].set(row(y0))
    attrs = attrs.at[_A_RW].set(row(rw))
    attrs = attrs.at[_A_MX].set(row(mean2d[:, 0]))
    attrs = attrs.at[_A_MY].set(row(mean2d[:, 1]))
    attrs = attrs.at[_A_CA].set(row(ell.ca))
    attrs = attrs.at[_A_CB].set(row(ell.cb))
    attrs = attrs.at[_A_CC].set(row(ell.cc))
    attrs = attrs.at[_A_NBA].set(row(ell.nba))
    attrs = attrs.at[_A_NBC].set(row(ell.nbc))
    attrs = attrs.at[_A_QT].set(row(ell.qthr))

    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * BLOCK
    grank_start = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right") - 1, 0, n - 1
    ).astype(jnp.int32)
    k_lo = jnp.clip((grank_start // WIN) * WIN, 0, n_pad - 2 * WIN).astype(
        jnp.int32
    )
    total = jnp.minimum(offsets[-1], instance_cap).astype(jnp.int32)

    fn = _build_expand(n_blocks, tiles_x, num_tiles, n, n_pad, tile_w,
                       tile_h, interpret, vma_of(attrs))
    tile_f, g_f = fn(k_lo, total[None], attrs, attrs)
    return (
        tile_f.reshape(-1).astype(jnp.int32),
        g_f.reshape(-1).astype(jnp.int32),
    )
