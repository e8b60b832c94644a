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
from event3dgs_tpu.ops.pallas_util import (
    out_struct, revary, strip_vma, unify_vma, vma_index_map, vma_of,
)
from event3dgs_tpu.ops.projection import ProjectedGaussians
from event3dgs_tpu.ops.segscan import segment_sums_from_ranges

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0

# chunk=256 measured ~2-3% SLOWER fwd+bwd than 128 at 1080p/100k gaussians
# once measurement order is randomized (experiments/tools_exp_chunk.py with
# REV=1; a naive single-order sweep shows a spurious 23% from first-config
# warm-up under the TPU relay).  The knee is at 128: the 4×-larger
# (chunk, chunk) segmented-scan masks outweigh the halved per-step costs.
DEFAULT_CHUNK = 128

# packed-slab attribute rows (see ops/binning.py pack_instances)
_MX, _MY, _CA, _CB, _CC, _OPA, _CR, _CG, _CB2, _GL = range(10)

_Q = TILE_H * TILE_W  # pixels per tile; q = y_local*TILE_W + x_local


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _split2(x):
    """hi+lo bf16 split of an f32 array (xh + xl == x exactly)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dot2(xh, xl, mb):
    """``(xh + xl) @ mb`` with bf16 operands, f32 accumulation."""
    hi = jax.lax.dot(xh, mb, preferred_element_type=jnp.float32)
    lo = jax.lax.dot(xl, mb, preferred_element_type=jnp.float32)
    return hi + lo


def _split_dot(x, m):
    """``x @ m`` with f32 ``x`` and an *exactly bf16-representable* ``m``.

    The default single-pass MXU path rounds inputs to bf16 and visibly
    corrupts accumulated log-transmittances; Precision.HIGHEST lowers but
    costs 6 passes.  Because ``m`` is exact in bf16 (0/1 masks here), an
    explicit hi+lo bf16 split of ``x`` with f32 accumulation is exact to
    f32 in two MXU passes.
    """
    xh, xl = _split2(x)
    return _dot2(xh, xl, m.astype(jnp.bfloat16))


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


def _eye(n, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(dtype)


def _t_right(x, n):
    """(n, Q) → (Q, n) exact transpose via an eye(n) matmul.

    bf16 inputs use default precision (exact: 0/1 eye × bf16 values);
    Mosaic rejects HIGHEST-precision matmuls with bf16 operands.
    """
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    return jax.lax.dot_general(
        x, _eye(n, x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _t_from(x, n):
    """(Q, n) → (n, Q) exact transpose via an eye(n) matmul."""
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    return jax.lax.dot_general(
        _eye(n, x.dtype), x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


# centered tile-local pixel basis for the backward moment matmul: centering
# keeps |basis| ≤ ~240 so the f32-rounded moment dot loses no more than
# ~1e-4 relative after the (mx − px) reconstruction algebra.
_CXC = (TILE_W - 1) / 2.0
_CYC = (TILE_H - 1) / 2.0


def _moment_basis():
    """(8, Q) bf16 hi/lo pair: rows [1, x, y, x², xy, y², 0, 0] (centered).

    One matmul of this against the per-(pixel, instance) gradient weight
    ``dpw`` yields every spatial moment the backward pass needs — replacing
    nine full-size (Q, chunk) sublane reductions with small per-lane
    algebra (see the backward kernel).
    """
    q = jax.lax.broadcasted_iota(jnp.int32, (8, _Q), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (8, _Q), 0)
    pxc = (q % TILE_W).astype(jnp.float32) - _CXC
    pyc = (q // TILE_W).astype(jnp.float32) - _CYC
    vals = jnp.where(
        r == 0, 1.0,
        jnp.where(
            r == 1, pxc,
            jnp.where(
                r == 2, pyc,
                jnp.where(
                    r == 3, pxc * pxc,
                    jnp.where(r == 4, pxc * pyc,
                              jnp.where(r == 5, pyc * pyc, 0.0)),
                ),
            ),
        ),
    )
    return _split2(vals)


def _color_onehot24(s, chunk: int):
    """Color-scaled one-hot rhs pair for the fused rgb accumulation dot.

    Row c·8+t of the (24, chunk) matrix is ``oneh[t] · color_c`` — so a
    single (Q, chunk) @ (chunk, 24) matmul of the weights produces all
    three per-tile color accumulator updates at once (columns [r|g|b] of 8
    group tiles each).  Colors are split hi+lo so both returned factors are
    exactly bf16; paired with the hi+lo split of the lhs this keeps the
    accumulation f32-exact (the dropped lo·lo term is ≤2⁻¹⁸ relative).
    Everything here is (24, chunk)-sized — ~2% of the per-chunk VPU volume.
    """
    gl = s[_GL : _GL + 1, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (3 * GROUP, chunk), 0)
    tsel = ((rows % GROUP).astype(jnp.float32) == gl).astype(jnp.float32)
    band = rows // GROUP
    csel = jnp.where(
        band == 0, s[_CR : _CR + 1, :],
        jnp.where(band == 1, s[_CG : _CG + 1, :], s[_CB2 : _CB2 + 1, :]),
    )
    ch, cl = _split2(csel)
    tb = tsel.astype(jnp.bfloat16)
    return tb * ch, tb * cl  # (24, chunk) bf16, exact


def _tile_px():
    """Tile-local pixel coordinate columns ((Q,1) x, (Q,1) y), f32."""
    q = jax.lax.broadcasted_iota(jnp.int32, (_Q, 1), 0)
    px = (q % TILE_W).astype(jnp.float32)
    py = (q // TILE_W).astype(jnp.float32)
    return px, py


def _tile_alpha(s, px, py):
    """Alpha for a whole tile at once: (Q, chunk) from the packed slab.

    Means in the slab are tile-local, so one (Q, 1) local-coordinate column
    serves every lane regardless of which group tile it belongs to.  The
    slab's conic rows are pre-scaled (ca' = −ca/2 etc., see
    ``pack_instances``) so the power is a bare 3-term quadratic.  Every op
    here runs on (Q, chunk) data — this is the VPU-bound heart of the
    rasterizer, so the op count is kept minimal.
    """
    mx = s[_MX : _MX + 1, :]
    my = s[_MY : _MY + 1, :]
    ca = s[_CA : _CA + 1, :]  # -ca/2
    cb = s[_CB : _CB + 1, :]  # -cb
    cc = s[_CC : _CC + 1, :]  # -cc/2
    opa = s[_OPA : _OPA + 1, :]
    dx = mx - px  # (Q, chunk)
    dy = my - py  # (Q, chunk)
    power = ca * (dx * dx) + cb * (dx * dy) + cc * (dy * dy)
    expp = jnp.exp(power)
    raw = opa * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    # alpha < ALPHA_MIN ⇔ raw < ALPHA_MIN (the 0.99 clamp only lowers raw)
    alpha = jnp.where((power > 0.0) | (raw < ALPHA_MIN), 0.0, alpha)
    return alpha, jnp.log1p(-alpha), raw, expp


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

    def kernel(cg_ref, live_ref, nu_ref, packed_ref, rgb_ref, logt_ref,
               work_ref, acc24, ltc):
        k = pl.program_id(0)
        g = cg_ref[k]
        is_first = jnp.logical_or(k == 0, g != cg_ref[jnp.maximum(k - 1, 0)])
        # the grid is *dynamic* (nu_ref[0] steps — the all-pad tail of the
        # instance budget is never visited), so the last-step test must use
        # the dynamic bound, not total_chunks
        is_last = jnp.logical_or(
            k == nu_ref[0] - 1,
            g != cg_ref[jnp.minimum(k + 1, total_chunks - 1)],
        )

        @pl.when(is_first)
        def _():
            acc24[...] = jnp.zeros_like(acc24)
            ltc[...] = jnp.zeros_like(ltc)

        lt = ltc[...]  # (Q, 8)
        # Early-out at the granularity of the chunk's OWN tiles: a chunk is
        # dead when every tile its lanes belong to is saturated (all pixels
        # logT < LOG_T_SKIP) — tiles of the group the chunk doesn't touch
        # don't keep it alive (the round-3 group-wide max did, which on
        # depth-skewed groups left long saturated runs executing).  The
        # per-lane tile max arrives via a tiny (1, 8)×(8, chunk) one-hot
        # matmul from the slab's group-local row; pad lanes map to the
        # group's base tile, which can only over-keep (conservative).
        m8 = jnp.max(lt, axis=0, keepdims=True)  # (1, 8) per-tile max logT
        glr = packed_ref[_GL : _GL + 1, :]  # (1, chunk)
        gid8 = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, chunk), 0
        ).astype(jnp.float32)
        oneh_pre = (gid8 == glr).astype(jnp.bfloat16)
        lane_max = jax.lax.dot(
            m8.astype(jnp.bfloat16), oneh_pre,
            preferred_element_type=jnp.float32,
        )  # (1, chunk); bf16 rounding of m8 is ≪ the threshold margin
        do_work = (live_ref[k] > 0) & (jnp.max(lane_max) > LOG_T_SKIP)
        # per-chunk work flag lives in SMEM (scalar memory): a (1,1) VMEM
        # block would violate Mosaic's (8,128) min-tile rule, and the flags
        # are consumed scalar-prefetched by the backward kernel anyway.
        work_ref[k] = do_work.astype(jnp.int32)

        @pl.when(do_work)
        def _():
            s = packed_ref[...]
            px, py = _tile_px()
            alpha, l1m, _, _ = _tile_alpha(s, px, py)
            oneh, onehT, seg = _group_masks(s, chunk)
            lh, ll = _split2(l1m)  # one split reused by both l1m dots
            cum = _dot2(lh, ll, seg.astype(jnp.bfloat16))  # segmented scan
            lt_sel = _split_dot(lt, oneh)  # (Q, chunk) entry logT per lane
            w = alpha * jnp.exp(lt_sel + (cum - l1m))
            # all three color accumulators in ONE fused 24-wide dot: the rhs
            # carries the (bf16-split) colors folded into the one-hot tile
            # masks, so no per-channel (Q, chunk) products are materialized
            wh, wl = _split2(w)
            m_h, m_l = _color_onehot24(s, chunk)  # (24, chunk) bf16 pair
            rhs_h = _t_right(m_h, 3 * GROUP).astype(jnp.bfloat16)
            rhs_l = _t_right(m_l, 3 * GROUP).astype(jnp.bfloat16)
            upd = (
                jax.lax.dot(wh, rhs_h, preferred_element_type=jnp.float32)
                + jax.lax.dot(wh, rhs_l, preferred_element_type=jnp.float32)
                + jax.lax.dot(wl, rhs_h, preferred_element_type=jnp.float32)
            )
            acc24[...] = acc24[...] + upd
            ltc[...] = lt + _dot2(lh, ll, onehT.astype(jnp.bfloat16))

        @pl.when(is_last)
        def _():
            t24 = _t_from(acc24[...], 3 * GROUP)  # (24, Q)
            rgb_ref[0] = t24[0:8]
            rgb_ref[1] = t24[8:16]
            rgb_ref[2] = t24[16:24]
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
        nu_ref,
        packed_ref,
        grgb_ref,
        glogt_ref,
        logt_ref,
        gout_ref,
        gB,
        ltc,
        gp_all,
    ):
        k = pl.program_id(0)
        c = nu_ref[0] - 1 - k  # dynamic grid: walk the used chunks in reverse
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
            # all three image cotangent planes in one (Q, 24) scratch: the
            # (3, 8, Q) block is a (24, Q) array in memory (pure view)
            gp_all[...] = _t_right(
                grgb_ref[...].reshape(3 * GROUP, _Q), 3 * GROUP
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
            caS = s[_CA : _CA + 1, :]  # -ca/2 (pre-scaled, pack_instances)
            cbS = s[_CB : _CB + 1, :]  # -cb
            ccS = s[_CC : _CC + 1, :]  # -cc/2
            opa = s[_OPA : _OPA + 1, :]

            px, py = _tile_px()
            alpha, l1m, raw, _ = _tile_alpha(s, px, py)
            oneh, onehT, seg = _group_masks(s, chunk)
            segb = seg.astype(jnp.bfloat16)
            onehTb = onehT.astype(jnp.bfloat16)
            lh, ll = _split2(l1m)
            cum = _dot2(lh, ll, segb)
            suml8 = _dot2(lh, ll, onehTb)  # (Q, 8) in-chunk logT deltas
            lt_entry = ltc[...] - suml8  # per-group logT at chunk entry
            lt_in = _split_dot(lt_entry, oneh)  # per-lane entry logT
            t_excl = jnp.exp(lt_in + (cum - l1m))
            w = alpha * t_excl

            # per-lane color·ḡ via ONE fused dot against the color-scaled
            # one-hots (instead of three gathers + a 3-term combine)
            gph, gpl = _split2(gp_all[...])  # (Q, 24) — cheap casts
            m_h, m_l = _color_onehot24(s, chunk)  # (24, chunk) bf16

            def dots(ah, al, bh, bl, dims, full=False):
                # hi/lo-split product; the lo·lo term (≤2⁻¹⁸ relative) is
                # dropped unless `full` — the moment dot keeps it because
                # the binomial reconstruction amplifies its error
                d = lambda x, y: jax.lax.dot_general(
                    x, y, dims, preferred_element_type=jnp.float32)
                r = d(ah, bh) + d(ah, bl) + d(al, bh)
                return r + d(al, bl) if full else r

            NN = (((1,), (0,)), ((), ()))  # plain matmul
            TN = (((0,), (0,)), ((), ()))  # contract both dim-0
            gc = dots(gph, gpl, m_h, m_l, NN)  # (Q, chunk)

            u = w * gc
            uh, ul = _split2(u)
            totals8 = _dot2(uh, ul, onehTb)  # (Q, 8) per-group chunk totals
            cum_u = _dot2(uh, ul, segb)
            # color behind each instance (pre-dotted with ḡ): carried gB plus
            # the in-chunk suffix — gB and totals8 share one one-hot select.
            gBsum = gB[...] + totals8
            gBk = _split_dot(gBsum, oneh) - cum_u

            # at the 0.99 clamp dα/d(o·exp(power)) = 0
            passthrough = (alpha > 0.0) & (raw < ALPHA_MAX)
            dalpha = gc * t_excl - gBk / (1.0 - alpha)
            dpw = jnp.where(passthrough, dalpha * alpha, 0.0)

            # spatial moments of dpw in ONE (8-row) matmul against the
            # centered pixel basis; every positional gradient row is then
            # small per-lane algebra (dx = mxc − pxc expands binomially).
            ph, pl_ = _split2(dpw)
            f_h, f_l = _moment_basis()
            M = dots(f_h, f_l, ph, pl_, NN, full=True)  # (8, chunk)
            M0, MX, MY = M[0:1], M[1:2], M[2:3]
            MXX, MXY, MYY = M[3:4], M[4:5], M[5:6]
            mxc = s[_MX : _MX + 1, :] - _CXC
            myc = s[_MY : _MY + 1, :] - _CYC
            Sx = mxc * M0 - MX  # Σ dpw·dx
            Sy = myc * M0 - MY
            Sxx = mxc * Sx - mxc * MX + MXX  # Σ dpw·dx²
            Sxy = mxc * Sy - myc * MX + MXY
            Syy = myc * Sy - myc * MY + MYY

            # per-instance color rows: Σ_q w·ḡ_c = one (24-col) dot of the
            # cotangent scratch against w, then a one-hot tile select
            wh, wl = _split2(w)
            CR = dots(gph, gpl, wh, wl, TN)  # (24, chunk)

            def colrow(c0):
                return jnp.sum(oneh * CR[c0 : c0 + GROUP], axis=0,
                               keepdims=True)

            inv_opa = 1.0 / jnp.maximum(opa, 1e-20)
            rows = [
                2.0 * caS * Sx + cbS * Sy,  # d mean2d.x = -(ca·Sx + cb·Sy)
                2.0 * ccS * Sy + cbS * Sx,  # d mean2d.y
                -0.5 * Sxx,  # d conic a
                -Sxy,  # d conic b
                -0.5 * Syy,  # d conic c
                M0 * inv_opa,  # d opacity (dα/do = exp(power) = α/o on pass)
                colrow(0),  # d color r
                colrow(GROUP),  # d color g
                colrow(2 * GROUP),  # d color b
            ]
            g16 = jnp.concatenate(
                rows + [jnp.zeros((PACK_ROWS - 9, chunk), jnp.float32)],
                axis=0,
            )
            # emit the gradient slab *instance-major* ((chunk, 16) block):
            # the reduction's permutation gather then reads it directly,
            # with no full-slab XLA transpose pass in between.
            gout_ref[...] = _t_right(g16, PACK_ROWS)

            gB[...] = gBsum
            ltc[...] = lt_entry

    return kernel


def build_grid_specs(chunk: int, total_chunks: int, grid_size=None):
    """Grid specs for the fwd/bwd compositing kernels (shared with tooling).

    Flat chunk grid: step k → packed chunk k (fwd) / nu-1-k (bwd); the
    chunk→group table (scalar-prefetched) drives the image block indices.
    Index maps receive the prefetched scalars (cg, aux, nu) — aux is the
    chunk-liveness table (fwd) / the fwd-recorded work flags (bwd), and nu
    is the (dynamic) number of used chunks = the grid size.  ``grid_size``
    may be a traced scalar (Mosaic dynamic grid): the all-pad tail of the
    instance budget then costs zero grid steps.
    """
    if grid_size is None:
        grid_size = total_chunks

    @vma_index_map
    def chunk_map(k, cg, aux, nu):
        return (0, k)

    @vma_index_map
    def rgb_map_fwd(k, cg, aux, nu):
        return (0, cg[k], 0)

    @vma_index_map
    def pix_map_fwd(k, cg, aux, nu):
        return (cg[k], 0)

    @vma_index_map
    def chunk_map_rev(k, cg, aux, nu):
        return (0, nu[0] - 1 - k)

    @vma_index_map
    def rgb_map_bwd(k, cg, aux, nu):
        return (0, cg[nu[0] - 1 - k], 0)

    @vma_index_map
    def pix_map_bwd(k, cg, aux, nu):
        return (cg[nu[0] - 1 - k], 0)

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk→group table, chunk liveness, n_used
        grid=(grid_size,),
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
            pltpu.VMEM((_Q, 3 * GROUP), jnp.float32),  # rgb accumulator
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # log-transmittance carry
        ],
    )

    @vma_index_map
    def gout_map_rev(k, cg, aux, nu):
        return (nu[0] - 1 - k, 0)

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk→group table, fwd work flags, n_used
        grid=(grid_size,),
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
            # instance-major gradient slab: (chunk, 16) rows per chunk
            pl.BlockSpec((chunk, PACK_ROWS), gout_map_rev,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # suffix color·ḡ carry
            pltpu.VMEM((_Q, GROUP), jnp.float32),  # log-transmittance carry
            pltpu.VMEM((_Q, 3 * GROUP), jnp.float32),  # rgb cotangents
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

    def grid_arg(binning):
        # NOTE: static grid on purpose — a dynamic (traced) Mosaic grid
        # bound measured ~2.6× slower per step (it defeats DMA
        # double-buffering), wiping out the saved tail steps.  The pad tail
        # is minimized by sizing instance_cap adaptively instead: the
        # training loop measures real counts (`train/loop.py:
        # measure_instance_cap`) and rebuilds with a bigger cap before the
        # binning would overflow.
        return jnp.full((1,), total_chunks, jnp.int32), total_chunks

    def run_forward(mean2d, depth, conic, radius, validf, colors, opacities):
        if interpret:
            # interpret mode cannot replay kernels against vma-annotated
            # operands (see pallas_util.strip_vma); safe here because the
            # custom_vjp boundary hides this region from AD, and the public
            # outputs are re-varied before they leave the vjp.
            (mean2d, depth, conic, radius, validf, colors, opacities) = (
                strip_vma(
                    mean2d, depth, conic, radius, validf, colors, opacities
                )
            )
        sg = jax.lax.stop_gradient
        binning = bin_gaussians(
            sg(mean2d), sg(depth), sg(radius), sg(validf) > 0.5,
            width, height, instance_cap, chunk,
            opacities=sg(opacities), conic=sg(conic),
        )
        packed = pack_instances(binning, mean2d, conic, colors, opacities)
        nu, gsize = grid_arg(binning)
        fwd_grid_spec, _ = build_grid_specs(chunk, total_chunks, gsize)
        vma = vma_of(packed)
        rgb, logt, work = pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=[
                out_struct((3, n_groups * GROUP, _Q), jnp.float32, vma),
                out_struct((n_groups * GROUP, _Q), jnp.float32, vma),
                out_struct((total_chunks,), jnp.int32, vma),
            ],
            interpret=interpret,
        )(binning.chunk_group, binning.chunk_live, nu, packed)
        return rgb, logt, work, binning, packed, nu

    @jax.custom_vjp
    def rasterize(mean2d, depth, conic, radius, validf, colors, opacities):
        vma = vma_of(mean2d)
        rgb, logt, _, _, _, _ = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return revary(untile(rgb), vma), revary(untile(logt), vma)

    def rasterize_fwd(mean2d, depth, conic, radius, validf, colors, opacities):
        vma = vma_of(mean2d)
        rgb, logt, work, binning, packed, nu = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return (revary(untile(rgb), vma), revary(untile(logt), vma)), (
            binning.chunk_group, work, nu, binning.dest_exp,
            binning.rank_offsets, binning.order, packed, logt,
        )

    def rasterize_bwd(res, cotangents):
        (chunk_group, work, nu, dest_exp, rank_offsets, order, packed,
         logt) = res
        g_rgb, g_logt = cotangents
        vma = vma_of(g_rgb)
        if interpret:
            g_rgb, g_logt = strip_vma(g_rgb, g_logt)
        _, bwd_grid_spec = build_grid_specs(chunk, total_chunks, total_chunks)
        gpacked = pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=[
                out_struct((padded_cap, PACK_ROWS), jnp.float32,
                           vma_of(packed)),
            ],
            interpret=interpret,
        )(chunk_group, work, nu, packed, retile(g_rgb), retile(g_logt), logt)[0]

        # per-instance grads → per-Gaussian grads without any scatter-add:
        # the kernel already wrote the slab instance-major, so this is one
        # permutation gather to expansion order (contiguous per depth rank),
        # one Pallas prefix scan, two boundary gathers (ops/segscan.py),
        # then un-rank.  Dead expansion slots carry the sentinel index
        # padded_cap → mode="fill" zeros them, which the scan's n_live
        # skipping relies on.
        g_exp = jnp.take(
            gpacked, dest_exp, axis=0, mode="fill", fill_value=0.0
        )
        sums_rank = segment_sums_from_ranges(
            g_exp, rank_offsets[:-1], rank_offsets[1:], interpret,
            n_live=rank_offsets[-1], adjacent=True,
        )  # [n, 16], depth-rank order
        gsum = (
            jnp.zeros((n, PACK_ROWS), jnp.float32)
            .at[order]
            .set(sums_rank, mode="drop")
        )
        # every cotangent must carry the primal inputs' varying-axes set
        # (shard_map check_vma rejects a vma mismatch in custom_vjp outputs)
        zeros_n = revary(jnp.zeros((n,), jnp.float32), vma)
        rv = lambda x: revary(x, vma)
        return (
            rv(gsum[:, 0:2]),  # mean2d
            zeros_n,  # depth (ordering only — no gradient, as in CUDA)
            rv(gsum[:, 2:5]),  # conic
            zeros_n,  # radius
            zeros_n,  # validf
            rv(gsum[:, 6:9]),  # colors
            rv(gsum[:, 5]),  # opacities
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
    rgb, logt = rasterize_tiled_partials(
        proj, colors, opacities, width, height,
        instance_cap=instance_cap, chunk=chunk, interpret=interpret,
    )
    return rgb + jnp.exp(logt)[:, :, None] * background[None, None, :]


def rasterize_tiled_partials(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    instance_cap: int | None = None,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-background partials: ([H, W, 3] rgb, [H, W] log-transmittance).

    The building block for Gaussian-sharded compositing (``parallel/``):
    the kernel's log-space transmittance carry makes the over-operator merge
    of depth-ordered shards exact — ``rgb = Σ_k exp(Σ_{j<k} logT_j)·rgb_k``,
    ``logT = Σ_k logT_k`` (see ``parallel.compose.merge_depth_partials``).
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
        *unify_vma(
            proj.mean2d,
            proj.depth,
            proj.conic,
            proj.radius,
            proj.valid.astype(jnp.float32),
            colors,
            opacities,
        )
    )
    rgb = jnp.transpose(rgb_p, (1, 2, 0))[:height, :width, :]
    return rgb, logt_p[:height, :width]
