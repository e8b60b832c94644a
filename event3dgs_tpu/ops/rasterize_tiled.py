"""Production tiled rasterizer: Pallas compositing kernels + custom VJP.

TPU-first design (see also ops/binning.py):

- **Tiles are 32×32 pixels**, grouped 8 per *tile group*.  Inside the kernel
  a tile's Q = 1024 pixels live on the sublane axis and instances on lanes:
  a (Q, chunk) alpha matrix per chunk.  Instance attributes arrive as
  (1, chunk) row vectors sliced from the DMA'd slab and broadcast directly —
  the whole kernel needs **zero general transposes or reshapes** (Mosaic
  supports neither); the only reorientations are tiny eye-matmuls between
  the (Q, 8) per-group accumulators and the (8, Q) image blocks.
- **Group-packed streaming**: a chunk's 128 instances may belong to any of
  the 8 tiles of one group (ops/binning.py pads per group, not per tile).
  Per-lane tile membership is resolved with one-hot matmuls: carries are
  (Q, 8) per-group arrays, gathered to lanes / scattered from lanes by
  multiplying with the (8, chunk) one-hot of the group-local tile index.
- **Compositing-order scan on the MXU**: the exclusive-transmittance scan
  along the instance (lane) axis is a *segmented* triangular matmul — the
  0/1 mask is (j ≤ k) ∧ (tile_j = tile_k), so lanes of different tiles
  scan independently.  Mosaic has no cumsum lowering, and this keeps the
  VPU free for alpha math.
- **Log-space transmittance**: the carry is log T, so deep opaque stacks
  never underflow and the backward pass reconstructs each chunk's entering
  transmittance *exactly* by subtraction (the CUDA backward divides by (1-α)
  running back-to-front; subtraction in log space is the stable equivalent).
- **Backward** walks chunks in reverse, recomputing alphas, and writes
  per-instance gradients into a packed slab (each instance slot belongs to
  exactly one tile, so no atomics are needed — the scatter back to
  per-Gaussian gradients is one segment_sum outside the kernel).
- The kernels produce the image **tile-major** ((3, G·8, Q)): one group =
  one (3, 8, Q) output block; an XLA reshape/transpose outside restores
  (H, W, 3).

Numerics match the oracle (`rasterize_reference`): α = min(0.99, o·exp(p)),
contributions with power > 0 or α < 1/255 are skipped, and a Gaussian's
support is its 3σ tile rect.  Early-out is **chunk-level**, not per-pixel:
a chunk is skipped when every pixel of every tile of its group has
log T < ln 1e-6 at entry (``LOG_T_SKIP``) — the TPU analogue of the CUDA
kernel's per-pixel ``T < 1e-4`` stop, coarser (a whole group must saturate)
but branch-free per lane.  Consequently the ``logt`` output saturates near
ln(1e-6) for fully opaque tiles, which is harmless for background
compositing (weight < 1e-6).  The skip decision is recorded per chunk so
the backward sweep skips exactly the same chunks (its subtractive logT
reconstruction requires it).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from event3dgs_tpu.ops.binning import (
    GROUP,
    PACK_ROWS,
    TILE_H,
    TILE_W,
    bin_gaussians,
    cdiv,
    pack_instances,
    tile_grid,
)
from event3dgs_tpu.ops.projection import ProjectedGaussians
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0

DEFAULT_CHUNK = 128

# packed-slab attribute rows (see ops/binning.py pack_instances)
_MX, _MY, _CA, _CB, _CC, _OPA, _CR, _CG, _CB2, _GL = range(10)

_Q = TILE_H * TILE_W  # pixels per tile; q = y_local*TILE_W + x_local


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _split_dot(x, m):
    """``x @ m`` with f32 ``x`` and an *exactly bf16-representable* ``m``.

    The default single-pass MXU path rounds inputs to bf16 and visibly
    corrupts accumulated log-transmittances; Precision.HIGHEST lowers but
    costs 6 passes.  Because ``m`` is exact in bf16 (0/1 masks here), an
    explicit hi+lo bf16 split of ``x`` with f32 accumulation is exact to
    f32 in two MXU passes.
    """
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    hi = jax.lax.dot(xh, mb, preferred_element_type=jnp.float32)
    lo = jax.lax.dot(xl, mb, preferred_element_type=jnp.float32)
    return hi + lo


def _t_to8(x):
    """(8, Q) → (Q, 8) exact transpose via an eye(8) matmul."""
    eye = _eye8(x.dtype)
    return jax.lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _t_from8(x):
    """(Q, 8) → (8, Q) exact transpose via an eye(8) matmul."""
    eye = _eye8(x.dtype)
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _eye8(dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 1)
    return (rows == cols).astype(dtype)


def _tile_px():
    """Tile-local pixel coordinate columns ((Q,1) x, (Q,1) y), f32."""
    q = jax.lax.broadcasted_iota(jnp.int32, (_Q, 1), 0)
    px = (q % TILE_W).astype(jnp.float32)
    py = (q // TILE_W).astype(jnp.float32)
    return px, py


def _tile_alpha(s, px, py):
    """Alpha for a whole tile at once: (Q, chunk) from the packed slab.

    Means in the slab are tile-local, so one (Q, 1) local-coordinate column
    serves every lane regardless of which group tile it belongs to.
    """
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


def _group_masks(s, chunk: int):
    """One-hot tile-membership masks from the slab's group-local index row.

    Returns (oneh (8, chunk), onehT (chunk, 8), seg (chunk, chunk)) where
    ``seg[j, k] = [j ≤ k][tile_j = tile_k]`` drives the segmented scan.
    """
    gl = s[_GL : _GL + 1, :]  # (1, chunk) f32 in {0..7}
    gid = jax.lax.broadcasted_iota(jnp.int32, (GROUP, chunk), 0).astype(
        jnp.float32
    )
    oneh = (gid == gl).astype(jnp.float32)  # (8, chunk)
    onehT = _t_to8(oneh)  # (chunk, 8)
    # same-tile mask = onehTᵀ·oneh (0/1 exact in bf16 → exact product)
    samet = jax.lax.dot(
        onehT.astype(jnp.bfloat16), oneh.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (chunk, chunk)
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (rows <= cols).astype(jnp.float32)
    return oneh, onehT, samet * tri


LOG_T_SKIP = -13.8  # ln(1e-6): chunk-level early-out threshold


def _make_fwd_kernel(chunk: int, total_chunks: int):
    """Forward compositing over a flat chunk grid.

    One grid step = one (16, chunk) slab; consecutive steps that share a
    tile group revisit the same output block (Pallas keeps it in VMEM and
    flushes on group change), and the pipeline emitter double-buffers the
    slab DMA — there is no manual DMA and no per-group warm-up stall.
    Accumulators (per-pixel rgb and log-transmittance, (Q, 8) per group
    tile) live in scratch, reset on each group's first chunk.
    """

    def kernel(cg_ref, live_ref, packed_ref, rgb_ref, logt_ref, work_ref,
               acc_r, acc_g, acc_b, ltc):
        k = pl.program_id(0)
        g = cg_ref[k]
        is_first = jnp.logical_or(k == 0, g != cg_ref[jnp.maximum(k - 1, 0)])
        is_last = jnp.logical_or(
            k == total_chunks - 1,
            g != cg_ref[jnp.minimum(k + 1, total_chunks - 1)],
        )

        @pl.when(is_first)
        def _():
            acc_r[...] = jnp.zeros_like(acc_r)
            acc_g[...] = jnp.zeros_like(acc_g)
            acc_b[...] = jnp.zeros_like(acc_b)
            ltc[...] = jnp.zeros_like(ltc)

        lt = ltc[...]  # (Q, 8)
        do_work = (live_ref[k] > 0) & (jnp.max(lt) > LOG_T_SKIP)
        # per-chunk work flag lives in SMEM (scalar memory): a (1,1) VMEM
        # block would violate Mosaic's (8,128) min-tile rule, and the flags
        # are consumed scalar-prefetched by the backward kernel anyway.
        work_ref[k] = do_work.astype(jnp.int32)

        @pl.when(do_work)
        def _():
            s = packed_ref[...]
            px, py = _tile_px()
            alpha, l1m, _, _, _, _ = _tile_alpha(s, px, py)
            oneh, onehT, seg = _group_masks(s, chunk)
            cum = _split_dot(l1m, seg)  # segmented inclusive scan
            lt_sel = _split_dot(lt, oneh)  # (Q, chunk) entry logT per lane
            w = alpha * jnp.exp(lt_sel + cum - l1m)
            for acc, row in ((acc_r, _CR), (acc_g, _CG), (acc_b, _CB2)):
                u = w * s[row : row + 1, :]
                acc[...] = acc[...] + _split_dot(u, onehT)
            ltc[...] = lt + _split_dot(l1m, onehT)

        @pl.when(is_last)
        def _():
            rgb_ref[0] = _t_from8(acc_r[...])
            rgb_ref[1] = _t_from8(acc_g[...])
            rgb_ref[2] = _t_from8(acc_b[...])
            logt_ref[...] = _t_from8(ltc[...])

    return kernel


def _make_bwd_kernel(chunk: int, total_chunks: int):
    """Backward sweep over the flat chunk grid in reverse.

    Grid step k processes packed chunk ``total_chunks-1-k``, so groups are
    visited back-to-front in reverse order and each group's image cotangent
    blocks are fetched once (consecutive revisits).  The per-chunk gradient
    slab is a normal pipelined output block.  Carries (per-group suffix
    color·ḡ and running log-transmittance, (Q, 8)) live in scratch,
    initialized from the group's logT cotangent on its first (= deepest)
    chunk.
    """

    def kernel(
        cg_ref,
        work_ref,
        packed_ref,
        grgb_ref,
        glogt_ref,
        logt_ref,
        gout_ref,
        gB,
        ltc,
        gp_r,
        gp_g,
        gp_b,
    ):
        k = pl.program_id(0)
        c = total_chunks - 1 - k
        g = cg_ref[c]
        is_first = jnp.logical_or(
            k == 0, g != cg_ref[jnp.minimum(c + 1, total_chunks - 1)]
        )

        @pl.when(is_first)
        def _():
            # cotangent of the logT output IS gB's initialization:
            # dL/dα through T is -(ḡ_T·T + Σ_behind w·(ḡ·c))/(1-α);
            # ḡ_logT = ḡ_T·T.
            gB[...] = _t_to8(glogt_ref[...])
            ltc[...] = _t_to8(logt_ref[...])
            gp_r[...] = _t_to8(grgb_ref[0])
            gp_g[...] = _t_to8(grgb_ref[1])
            gp_b[...] = _t_to8(grgb_ref[2])

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

            px, py = _tile_px()
            alpha, l1m, dx, dy, raw, expp = _tile_alpha(s, px, py)
            oneh, onehT, seg = _group_masks(s, chunk)
            cum = _split_dot(l1m, seg)
            suml8 = _split_dot(l1m, onehT)  # (Q, 8) in-chunk logT deltas
            lt_entry = ltc[...] - suml8  # per-group logT at chunk entry
            lt_in = _split_dot(lt_entry, oneh)  # per-lane entry logT
            t_excl = jnp.exp(lt_in + cum - l1m)
            w = alpha * t_excl

            gr = _split_dot(gp_r[...], oneh)  # (Q, chunk) pixel cotangents
            gg = _split_dot(gp_g[...], oneh)
            gb_ = _split_dot(gp_b[...], oneh)
            gc = (
                gr * s[_CR : _CR + 1, :]
                + gg * s[_CG : _CG + 1, :]
                + gb_ * s[_CB2 : _CB2 + 1, :]
            )
            u = w * gc
            totals8 = _split_dot(u, onehT)  # (Q, 8) per-group chunk totals
            cum_u = _split_dot(u, seg)
            tot_sel = _split_dot(totals8, oneh)
            # color behind each instance (pre-dotted with ḡ): carried gB plus
            # the in-chunk suffix.
            gBk = _split_dot(gB[...], oneh) + (tot_sel - cum_u)

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

            gB[...] = gB[...] + totals8
            ltc[...] = lt_entry

    return kernel


def build_grid_specs(chunk: int, total_chunks: int):
    """Grid specs for the fwd/bwd compositing kernels (shared with tooling).

    Flat chunk grid: step k → packed chunk k (fwd) / total-1-k (bwd); the
    chunk→group table (scalar-prefetched) drives the image block indices.
    Index maps receive both prefetched scalars (cg, aux) — aux is the
    chunk-liveness table (fwd) / the fwd-recorded work flags (bwd).
    """

    def chunk_map(k, cg, aux):
        return (0, k)

    def rgb_map_fwd(k, cg, aux):
        return (0, cg[k], 0)

    def pix_map_fwd(k, cg, aux):
        return (cg[k], 0)

    def chunk_map_rev(k, cg, aux):
        return (0, total_chunks - 1 - k)

    def rgb_map_bwd(k, cg, aux):
        return (0, cg[total_chunks - 1 - k], 0)

    def pix_map_bwd(k, cg, aux):
        return (cg[total_chunks - 1 - k], 0)

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→group table, chunk liveness
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, GROUP, _Q), rgb_map_fwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, _Q), pix_map_fwd,
                         memory_space=pltpu.VMEM),
            # per-chunk work flags: whole-array SMEM block (trivial window)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # r accumulator
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # g accumulator
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # b accumulator
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # log-transmittance carry
        ],
    )

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→group table, fwd-recorded work flags
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, GROUP, _Q), rgb_map_bwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, _Q), pix_map_bwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, _Q), pix_map_bwd,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PACK_ROWS, chunk), chunk_map_rev,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # suffix color·ḡ carry
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # log-transmittance carry
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # r cotangent (per group)
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # g cotangent
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # b cotangent
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
    n_groups = cdiv(num_tiles, GROUP)
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
    padded_cap = instance_cap + n_groups * chunk

    total_chunks = padded_cap // chunk
    assert padded_cap % chunk == 0, (padded_cap, chunk)

    fwd_kernel = _make_fwd_kernel(chunk, total_chunks)
    bwd_kernel = _make_bwd_kernel(chunk, total_chunks)
    fwd_grid_spec, bwd_grid_spec = build_grid_specs(chunk, total_chunks)

    def untile(x):
        """(…, G·8, Q) tile-major → (…, hp, wp) image rows."""
        lead = x.shape[:-2]
        x = x[..., :num_tiles, :].reshape(
            lead + (tiles_y, tiles_x, TILE_H, TILE_W)
        )
        x = jnp.swapaxes(x, -3, -2)  # (…, ty, TILE_H, tx, TILE_W)
        return x.reshape(lead + (hp, wp))

    def retile(x):
        """(…, hp, wp) image rows → (…, G·8, Q) tile-major (pads groups)."""
        lead = x.shape[:-2]
        x = x.reshape(lead + (tiles_y, TILE_H, tiles_x, TILE_W))
        x = jnp.swapaxes(x, -3, -2)
        x = x.reshape(lead + (num_tiles, _Q))
        pad = n_groups * GROUP - num_tiles
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(lead + (pad, _Q), x.dtype)], axis=-2
            )
        return x

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
                jax.ShapeDtypeStruct((3, n_groups * GROUP, _Q), jnp.float32),
                jax.ShapeDtypeStruct((n_groups * GROUP, _Q), jnp.float32),
                jax.ShapeDtypeStruct((total_chunks,), jnp.int32),
            ],
            interpret=interpret,
        )(binning.chunk_group, binning.chunk_live, packed)
        return rgb, logt, work, binning, packed

    @jax.custom_vjp
    def rasterize(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, _, _, _ = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return untile(rgb), untile(logt)

    def rasterize_fwd(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, work, binning, packed = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return (untile(rgb), untile(logt)), (
            binning.chunk_group, work, binning.dest_exp,
            binning.rank_offsets, binning.order, packed, logt,
        )

    def rasterize_bwd(res, cotangents):
        (chunk_group, work, dest_exp, rank_offsets, order, packed, logt) = res
        g_rgb, g_logt = cotangents
        gpacked = pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=[jax.ShapeDtypeStruct((PACK_ROWS, padded_cap), jnp.float32)],
            interpret=interpret,
        )(chunk_group, work, packed, retile(g_rgb), retile(g_logt), logt)[0]

        # per-instance grads → per-Gaussian grads without any scatter-add:
        # gather to expansion order (contiguous per depth rank), one Pallas
        # prefix scan, two gathers (ops/segscan.py), then un-rank.  The XLA
        # transpose is one linear pass (Mosaic can't DMA 16-lane slices, so
        # the kernel writes attribute-major); the barrier stops XLA from
        # fusing it into the gather as strided per-row reads.
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
