"""Production tiled rasterizer: Pallas compositing kernels + custom VJP.

TPU-first design (see also ops/binning.py):

- **Tiles are 8×128 pixels**; inside the kernel each tile is swept one pixel
  row at a time with *pixels on sublanes and instances on lanes*: a
  (TILE_W, chunk) alpha matrix per row.  Instance attributes arrive as
  (1, chunk) row vectors sliced from the DMA'd slab and broadcast directly —
  the whole kernel needs **zero transposes or reshapes** (Mosaic supports
  neither in general).
- **Chunked streaming**: each tile's depth-ordered instance list is stored
  attribute-major ([16, padded_cap]) so the per-chunk DMA is one contiguous,
  lane-aligned (16, chunk) slab.
- **Compositing-order scan on the MXU**: the exclusive-transmittance scan
  along the instance (lane) axis is a constant upper-triangular matmul —
  Mosaic has no cumsum lowering, and this keeps the VPU free for alpha math.
- **Log-space transmittance**: the carry is log T, so deep opaque stacks
  never underflow and the backward pass reconstructs each chunk's entering
  transmittance *exactly* by subtraction (the CUDA backward divides by (1-α)
  running back-to-front; subtraction in log space is the stable equivalent).
- **Backward** walks chunks in reverse, recomputing alphas, and writes
  per-instance gradients into a packed slab (each instance slot belongs to
  exactly one tile, so no atomics are needed — the scatter back to
  per-Gaussian gradients is one segment_sum outside the kernel).
- The kernels produce the image **W-major** ((3, Wp, Hp)) because pixel-x
  lives on sublanes; one XLA transpose outside restores (H, W, 3).

Numerics match the oracle (`rasterize_reference`): α = min(0.99, o·exp(p)),
contributions with power > 0 or α < 1/255 are skipped, and a Gaussian's
support is its 3σ tile rect.  Early-out is **chunk-level**, not per-pixel:
a chunk is skipped when every pixel of its tile has log T < ln 1e-6 at
entry (``LOG_T_SKIP``) — the TPU analogue of the CUDA kernel's per-pixel
``T < 1e-4`` stop, coarser (whole tile must saturate) but branch-free per
lane.  Consequently the ``logt`` output saturates near ln(1e-6) for fully
opaque tiles, which is harmless for background compositing (weight < 1e-6).
The skip decision is recorded per chunk so the backward sweep skips exactly
the same chunks (its subtractive logT reconstruction requires it).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from event3dgs_tpu.ops.binning import (
    PACK_ROWS,
    TILE_H,
    TILE_W,
    bin_gaussians,
    pack_instances,
    tile_grid,
)
from event3dgs_tpu.ops.projection import ProjectedGaussians
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0

DEFAULT_CHUNK = 128

# packed-slab attribute rows (see ops/binning.py pack_instances)
_MX, _MY, _CA, _CB, _CC, _OPA, _CR, _CG, _CB2 = range(9)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _lane_cumsum(x):
    """Inclusive cumulative sum along the lane (last) axis.

    Mosaic has no cumsum lowering; a constant upper-triangular ones matmul
    runs the scan on the (otherwise idle) MXU:
    ``cum[p,k] = Σ_{j≤k} x[p,j] = (X · U)[p,k]`` with ``U[j,k] = [j ≤ k]``.
    """
    k = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows <= cols).astype(x.dtype)
    # The default single-pass MXU path rounds inputs to bf16 and visibly
    # corrupts the accumulated log-transmittance; Precision.HIGH has no
    # Mosaic lowering.  Because ``tri`` is exactly representable in bf16
    # (0/1 entries), an explicit hi+lo bf16 split of x with f32 accumulation
    # is exact to f32 in two MXU passes.
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    trib = tri.astype(jnp.bfloat16)
    hi = jax.lax.dot(xh, trib, preferred_element_type=jnp.float32)
    lo = jax.lax.dot(xl, trib, preferred_element_type=jnp.float32)
    return hi + lo


def _mxu_t(x):
    """2D transpose via identity matmul (Mosaic has no vector transpose).

    ``(a, b) → (b, a)`` as ``I_b · xᵀ`` — one tiny MXU op per tile, used only
    to move between the kernel's pixels-on-sublanes compute orientation and
    the (8, 128)-blocked H-major image layout.
    """
    b = x.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = (rows == cols).astype(x.dtype)
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


_Q = TILE_H * TILE_W  # all pixels of one tile, q = y_local*TILE_W + x_local


def _tile_px(t, tiles_x):
    """Pixel coordinate columns for tile ``t``: ((Q,1) x, (Q,1) y) f32."""
    i = t // tiles_x
    j = t - i * tiles_x
    q = jax.lax.broadcasted_iota(jnp.int32, (_Q, 1), 0)
    px = (q % TILE_W + j * TILE_W).astype(jnp.float32)
    py = (q // TILE_W + i * TILE_H).astype(jnp.float32)
    return px, py


def _tile_alpha(s, px, py):
    """Alpha for a whole tile at once: (Q, chunk) from a (16, chunk) slab."""
    mx = s[_MX : _MX + 1, :]
    my = s[_MY : _MY + 1, :]
    ca = s[_CA : _CA + 1, :]
    cb = s[_CB : _CB + 1, :]
    cc = s[_CC : _CC + 1, :]
    opa = s[_OPA : _OPA + 1, :]
    dx = mx - px  # (Q, chunk)
    dy = my - py  # (Q, chunk)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    raw = opa * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    return alpha, jnp.log1p(-alpha), dx, dy, raw, expp


def _col_unstack(col):
    """(Q, 1) accumulator column → (TILE_H, TILE_W) H-major tile block.

    ``B[y, x] = col[y*TILE_W + x]``, computed as one (TILE_H, Q) × (Q, TILE_W)
    one-hot matmul — Mosaic lowers constant-iota matmuls natively, whereas
    sublane-offset slice concatenation has no lowering.
    """
    q = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_W), 1)
    colx = jnp.where(x == q % TILE_W, col, 0.0)  # (Q, TILE_W)
    yq = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, _Q), 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, _Q), 0)
    sel = (yq // TILE_W == yy).astype(jnp.float32)  # (TILE_H, Q)
    return jax.lax.dot(sel, colx, preferred_element_type=jnp.float32)


def _col_stack(block):
    """(TILE_H, TILE_W) H-major tile block → (Q, 1) pixel column.

    ``col[y*TILE_W + x] = B[y, x]``: a (Q, TILE_W) one-hot matmul picks row
    ``x = q mod TILE_W`` of ``Bᵀ``, then a lane-masked reduction keeps the
    ``y = q div TILE_W`` entry.
    """
    q = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_W), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_W), 1)
    m1 = (x == q % TILE_W).astype(jnp.float32)  # (Q, TILE_W)
    rows = jax.lax.dot_general(
        m1, block, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, TILE_H): rows[q, y] = B[y, q mod TILE_W]
    qy = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_H), 0)
    yl = jax.lax.broadcasted_iota(jnp.int32, (_Q, TILE_H), 1)
    sel = qy // TILE_W == yl
    return jnp.sum(jnp.where(sel, rows, 0.0), axis=1, keepdims=True)


LOG_T_SKIP = -13.8  # ln(1e-6): chunk-level early-out threshold


def _make_fwd_kernel(chunk: int, tiles_x: int, total_chunks: int):
    """Forward compositing over a flat chunk grid.

    One grid step = one (16, chunk) slab; consecutive steps that share a
    tile revisit the same output block (Pallas keeps it in VMEM and flushes
    on tile change), and the pipeline emitter double-buffers the slab DMA —
    there is no manual DMA and no per-tile warm-up stall.  Accumulators
    (per-pixel rgb and log-transmittance) live in scratch, reset on each
    tile's first chunk.

    Chunk-level early-out (the TPU analogue of the CUDA kernel's per-pixel
    ``T < 1e-4`` stop): a chunk is skipped when it has no live instance or
    when every pixel of its tile is already saturated (log T < ln 1e-6 at
    entry).  The decision is recorded per chunk in ``work_ref`` so the
    backward sweep — which cannot know entry transmittance until too late —
    skips exactly the same chunks (required for its subtractive logT
    reconstruction to stay consistent).
    """

    def kernel(ct_ref, live_ref, packed_ref, rgb_ref, logt_ref, work_ref,
               acc, ltc):
        k = pl.program_id(0)
        t = ct_ref[k]
        is_first = jnp.logical_or(k == 0, t != ct_ref[jnp.maximum(k - 1, 0)])
        is_last = jnp.logical_or(
            k == total_chunks - 1,
            t != ct_ref[jnp.minimum(k + 1, total_chunks - 1)],
        )

        @pl.when(is_first)
        def _():
            acc[...] = jnp.zeros_like(acc)
            ltc[...] = jnp.zeros_like(ltc)

        lt = ltc[...]  # (Q, 1)
        do_work = (live_ref[k] > 0) & (jnp.max(lt) > LOG_T_SKIP)
        # per-chunk work flag lives in SMEM (scalar memory): a (1,1) VMEM
        # block would violate Mosaic's (8,128) min-tile rule, and the flags
        # are consumed scalar-prefetched by the backward kernel anyway.
        work_ref[k] = do_work.astype(jnp.int32)

        @pl.when(do_work)
        def _():
            s = packed_ref[...]
            px, py = _tile_px(t, tiles_x)
            alpha, l1m, _, _, _, _ = _tile_alpha(s, px, py)
            cum = _lane_cumsum(l1m)
            w = alpha * jnp.exp(lt + cum - l1m)
            a = acc[...]
            contrib = [
                jnp.sum(w * s[row : row + 1, :], axis=1, keepdims=True)
                for row in (_CR, _CG, _CB2)
            ]
            acc[...] = a + jnp.concatenate(contrib, axis=1)
            ltc[...] = lt + cum[:, chunk - 1 : chunk]

        @pl.when(is_last)
        def _():
            a = acc[...]
            for ch in range(3):
                rgb_ref[ch] = _col_unstack(a[:, ch : ch + 1])
            logt_ref[...] = _col_unstack(ltc[...])

    return kernel


def _make_bwd_kernel(chunk: int, tiles_x: int, total_chunks: int):
    """Backward sweep over the flat chunk grid in reverse.

    Grid step k processes packed chunk ``total_chunks-1-k``, so tiles are
    visited back-to-front in reverse tile order and each tile's image
    cotangent blocks are fetched once (consecutive revisits).  The
    per-chunk gradient slab is a normal pipelined output block.  Carries
    (suffix color·ḡ and running log-transmittance) live in scratch,
    initialized from the tile's logT cotangent on first (= deepest) chunk.
    """

    def kernel(
        ct_ref,
        work_ref,
        packed_ref,
        grgb_ref,
        glogt_ref,
        logt_ref,
        gout_ref,
        gB,
        ltc,
        gpix,
    ):
        k = pl.program_id(0)
        c = total_chunks - 1 - k
        t = ct_ref[c]
        is_first = jnp.logical_or(
            k == 0, t != ct_ref[jnp.minimum(c + 1, total_chunks - 1)]
        )

        @pl.when(is_first)
        def _():
            # blocks arrive H-major (…, TILE_H, TILE_W); restack into the
            # kernel's (Q, 1) pixel-column orientation.
            # cotangent of the logT output IS gB's initialization:
            # dL/dα through T is -(ḡ_T·T + Σ_behind w·(ḡ·c))/(1-α);
            # ḡ_logT = ḡ_T·T.
            gB[...] = _col_stack(glogt_ref[...])
            ltc[...] = _col_stack(logt_ref[...])
            gpix[...] = jnp.concatenate(
                [_col_stack(grgb_ref[ch]) for ch in range(3)], axis=1
            )

        # skip exactly the chunks the forward pass skipped: their instances
        # were never composited, so their grads are zero AND the logT carry
        # must pass through unchanged.
        do_work = work_ref[c] > 0

        @pl.when(jnp.logical_not(do_work))
        def _():
            gout_ref[...] = jnp.zeros_like(gout_ref)

        @pl.when(do_work)
        def _():
            s = packed_ref[...]
            ca = s[_CA : _CA + 1, :]
            cb = s[_CB : _CB + 1, :]
            cc = s[_CC : _CC + 1, :]

            px, py = _tile_px(t, tiles_x)
            alpha, l1m, dx, dy, raw, expp = _tile_alpha(s, px, py)
            cum = _lane_cumsum(l1m)
            sum_l = cum[:, chunk - 1 : chunk]
            logt_in = ltc[...] - sum_l
            t_excl = jnp.exp(logt_in + cum - l1m)
            w = alpha * t_excl

            g = gpix[...]  # (Q, 3)
            gr = g[:, 0:1]
            gg = g[:, 1:2]
            gb_ = g[:, 2:3]
            gc = (
                gr * s[_CR : _CR + 1, :]
                + gg * s[_CG : _CG + 1, :]
                + gb_ * s[_CB2 : _CB2 + 1, :]
            )
            u = w * gc
            cum_u = _lane_cumsum(u)
            total_u = cum_u[:, chunk - 1 : chunk]
            # color behind each instance (pre-dotted with ḡ): carried gB plus
            # the in-chunk suffix.
            gBk = gB[...] + (total_u - cum_u)

            active = alpha > 0.0
            # at the 0.99 clamp dα/d(o·exp(power)) = 0
            passthrough = active & (raw < ALPHA_MAX)
            dalpha = gc * t_excl - gBk / (1.0 - alpha)
            dpw = jnp.where(passthrough, dalpha * alpha, 0.0)
            dopa_pw = jnp.where(passthrough, dalpha * expp, 0.0)

            def isum(x):  # per-instance sum over the pixel sublanes
                return jnp.sum(x, axis=0, keepdims=True)  # (1, chunk)

            rows = [
                isum(dpw * -(ca * dx + cb * dy)),  # d mean2d.x
                isum(dpw * -(cc * dy + cb * dx)),  # d mean2d.y
                isum(dpw * (-0.5) * dx * dx),  # d conic a
                isum(dpw * -(dx * dy)),  # d conic b
                isum(dpw * (-0.5) * dy * dy),  # d conic c
                isum(dopa_pw),  # d opacity
                isum(w * gr),  # d color r
                isum(w * gg),  # d color g
                isum(w * gb_),  # d color b
            ]
            gout_ref[...] = jnp.concatenate(
                rows + [jnp.zeros((PACK_ROWS - 9, chunk), jnp.float32)],
                axis=0,
            )

            gB[...] = gB[...] + total_u
            ltc[...] = logt_in

    return kernel


def build_grid_specs(chunk: int, tiles_x: int, total_chunks: int):
    """Grid specs for the fwd/bwd compositing kernels (shared with tooling).

    Flat chunk grid: step k → packed chunk k (fwd) / total-1-k (bwd); the
    chunk→tile table (scalar-prefetched) drives the image block indices.
    Index maps receive both prefetched scalars (ct, aux) — aux is the
    chunk-liveness table (fwd) / the fwd-recorded work flags (bwd).
    """

    def chunk_map(k, ct, aux):
        return (0, k)

    def rgb_map_fwd(k, ct, aux):
        t = ct[k]
        return (0, t // tiles_x, t % tiles_x)

    def pix_map_fwd(k, ct, aux):
        t = ct[k]
        return (t // tiles_x, t % tiles_x)

    def chunk_map_rev(k, ct, aux):
        return (0, total_chunks - 1 - k)

    def rgb_map_bwd(k, ct, aux):
        t = ct[total_chunks - 1 - k]
        return (0, t // tiles_x, t % tiles_x)

    def pix_map_bwd(k, ct, aux):
        t = ct[total_chunks - 1 - k]
        return (t // tiles_x, t % tiles_x)

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→tile table, chunk liveness
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, TILE_H, TILE_W), rgb_map_fwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map_fwd,
                         memory_space=pltpu.VMEM),
            # per-chunk work flags: whole-array SMEM block (trivial window)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_Q, 3), jnp.float32),  # rgb accumulator
            pltpu.VMEM((_Q, 1), jnp.float32),  # log-transmittance carry
        ],
    )

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→tile table, fwd-recorded work flags
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W), rgb_map_bwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map_bwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map_bwd,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map_rev,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_Q, 1), jnp.float32),  # suffix color·ḡ carry
            pltpu.VMEM((_Q, 1), jnp.float32),  # log-transmittance carry
            pltpu.VMEM((_Q, 3), jnp.float32),  # per-pixel rgb cotangent
        ],
    )
    return fwd_grid_spec, bwd_grid_spec


@lru_cache(maxsize=32)
def _build_rasterizer(
    n: int,
    width: int,
    height: int,
    instance_cap: int,
    chunk: int,
    interpret: bool,
):
    """Build (and cache) the custom-VJP rasterizer for a static shape set."""
    tiles_x, tiles_y = tile_grid(width, height)
    num_tiles = tiles_x * tiles_y
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
    padded_cap = instance_cap + num_tiles * chunk

    # image blocks are H-major: array (3, Hp, Wp), tile block (3, 8, 128)
    total_chunks = padded_cap // chunk
    assert padded_cap % chunk == 0, (padded_cap, chunk)

    fwd_kernel = _make_fwd_kernel(chunk, tiles_x, total_chunks)
    bwd_kernel = _make_bwd_kernel(chunk, tiles_x, total_chunks)
    fwd_grid_spec, bwd_grid_spec = build_grid_specs(
        chunk, tiles_x, total_chunks)

    def run_forward(mean2d, depth, conic, radius, validf, colors, opacities):
        sg = jax.lax.stop_gradient
        binning = bin_gaussians(
            sg(mean2d), sg(depth), sg(radius), sg(validf) > 0.5,
            width, height, instance_cap, chunk,
        )
        packed = pack_instances(binning, mean2d, conic, colors, opacities)
        rgb, logt, work = pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((total_chunks,), jnp.int32),
            ],
            interpret=interpret,
        )(binning.chunk_tile, binning.chunk_live, packed)
        return rgb, logt, work, binning, packed

    @jax.custom_vjp
    def rasterize(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, _, _, _ = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return rgb, logt

    def rasterize_fwd(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, work, binning, packed = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return (rgb, logt), (binning.chunk_tile, work,
                             binning.dest_exp, binning.rank_offsets,
                             binning.order, packed, logt)

    def rasterize_bwd(res, cotangents):
        (chunk_tile, work, dest_exp, rank_offsets, order, packed, logt) = res
        g_rgb, g_logt = cotangents
        gpacked = pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=[jax.ShapeDtypeStruct((PACK_ROWS, padded_cap), jnp.float32)],
            interpret=interpret,
        )(chunk_tile, work, packed, g_rgb, g_logt, logt)[0]

        # per-instance grads → per-Gaussian grads without any scatter-add:
        # gather to expansion order (contiguous per depth rank), one Pallas
        # prefix scan, two gathers (ops/segscan.py), then un-rank.  The XLA
        # transpose is one linear 68 MB pass (Mosaic can't DMA 16-lane
        # slices, so the kernel writes attribute-major); the barrier stops
        # XLA from fusing it into the gather as strided per-row reads.
        # only the first 9 attribute rows carry gradients — slicing before
        # the transpose/gather nearly halves their HBM traffic
        gpacked_t = jax.lax.optimization_barrier(gpacked[:9].T)
        g_exp = jnp.take(
            gpacked_t, dest_exp, axis=0, mode="fill", fill_value=0.0
        )
        sums_rank = segment_sums_from_ranges(
            g_exp, rank_offsets[:-1], rank_offsets[1:], interpret,
            n_live=rank_offsets[-1],
        )  # [n, 9], depth-rank order
        gsum = (
            jnp.zeros((n, 9), jnp.float32)
            .at[order]
            .set(sums_rank, mode="drop")
        )
        zeros_n = jnp.zeros((n,), jnp.float32)
        return (
            gsum[:, 0:2],  # mean2d
            zeros_n,  # depth (ordering only — no gradient, as in CUDA)
            gsum[:, 2:5],  # conic
            zeros_n,  # radius
            zeros_n,  # validf
            gsum[:, 6:9],  # colors
            gsum[:, 5],  # opacities
        )

    rasterize.defvjp(rasterize_fwd, rasterize_bwd)
    return rasterize


def rasterize_tiled(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    background: jnp.ndarray,
    width: int,
    height: int,
    instance_cap: int | None = None,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in fast replacement for :func:`rasterize_reference`.

    Returns [height, width, 3], differentiable w.r.t. the projected inputs,
    colors and opacities (and hence, through `project_gaussians`, the raw
    Gaussian parameters).
    """
    n = proj.mean2d.shape[0]
    if instance_cap is None:
        instance_cap = max(8 * n, 1 << 14)
    # round up to the expansion kernel's block size so the fast binning
    # path (Pallas expansion + counting sort) engages
    instance_cap = -(-int(instance_cap) // 1024) * 1024
    if interpret is None:
        interpret = _interpret_default()
    fn = _build_rasterizer(n, width, height, int(instance_cap), chunk, interpret)
    rgb_p, logt_p = fn(
        proj.mean2d,
        proj.depth,
        proj.conic,
        proj.radius,
        proj.valid.astype(jnp.float32),
        colors,
        opacities,
    )
    rgb = jnp.transpose(rgb_p, (1, 2, 0))[:height, :width, :]
    t_final = jnp.exp(logt_p)[:height, :width]
    return rgb + t_final[:, :, None] * background[None, None, :]
