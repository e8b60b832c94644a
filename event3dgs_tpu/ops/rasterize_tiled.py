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
support is its 3σ tile rect.  The per-pixel 1e-4 early-stop of the CUDA
kernel is not applied (contributions past saturation carry < 1e-4 weight,
far below visibility; the log-space carry keeps them finite and their
gradients negligible).
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


def _row_alpha(s, px, yr):
    """Alpha for one pixel row: (TILE_W, chunk) from a (16, chunk) slab.

    Args:
        s: (PACK_ROWS, chunk) slab value; attribute rows broadcast.
        px: (TILE_W, 1) pixel x coordinates (sublane column).
        yr: scalar f32 pixel y coordinate of this row.

    Returns:
        alpha, log1p(-alpha), dx, dy, raw (pre-clamp) alpha, exp(power).
    """
    mx = s[_MX : _MX + 1, :]
    my = s[_MY : _MY + 1, :]
    ca = s[_CA : _CA + 1, :]
    cb = s[_CB : _CB + 1, :]
    cc = s[_CC : _CC + 1, :]
    opa = s[_OPA : _OPA + 1, :]
    dx = mx - px  # (TILE_W, chunk)
    dy = my - yr  # (1, chunk)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    raw = opa * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    return alpha, jnp.log1p(-alpha), dx, dy, raw, expp


def _make_fwd_kernel(chunk: int, tiles_x: int):
    def kernel(offs_ref, chunks_ref, packed_ref, rgb_ref, logt_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i * tiles_x + j
        off = offs_ref[t]
        n_chunks = chunks_ref[t]
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_W, 1), 0) + j * TILE_W
        ).astype(jnp.float32)
        y0 = (i * TILE_H).astype(jnp.float32)

        # carries are per-row (TILE_W, 1) columns — Mosaic has no scatter-add,
        # so rows stay separate values, lane-concatenated at the end.
        def body(c, carry):
            rgb_cols, logt_cols = carry
            base = pl.multiple_of(off + c * chunk, chunk)
            dma = pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(base, chunk)], slab, sem
            )
            dma.start()
            dma.wait()
            s = slab[...]
            rgb_cols = tuple(list(ch) for ch in rgb_cols)
            logt_cols = list(logt_cols)
            for r in range(TILE_H):
                alpha, l1m, _, _, _, _ = _row_alpha(s, px, y0 + float(r))
                cum = _lane_cumsum(l1m)
                w = alpha * jnp.exp(logt_cols[r] + cum - l1m)
                for ch, row in ((0, _CR), (1, _CG), (2, _CB2)):
                    rgb_cols[ch][r] = rgb_cols[ch][r] + jnp.sum(
                        w * s[row : row + 1, :], axis=1, keepdims=True
                    )
                logt_cols[r] = logt_cols[r] + cum[:, chunk - 1 : chunk]
            return tuple(tuple(ch) for ch in rgb_cols), tuple(logt_cols)

        zcol = jnp.zeros((TILE_W, 1), jnp.float32)
        init = (
            tuple(tuple(zcol for _ in range(TILE_H)) for _ in range(3)),
            tuple(zcol for _ in range(TILE_H)),
        )
        rgb_cols, logt_cols = jax.lax.fori_loop(0, n_chunks, body, init)
        # assemble (TILE_W, TILE_H) then MXU-transpose into the H-major block
        for ch in range(3):
            rgb_ref[ch] = _mxu_t(jnp.concatenate(rgb_cols[ch], axis=1))
        logt_ref[...] = _mxu_t(jnp.concatenate(logt_cols, axis=1))

    return kernel


def _make_bwd_kernel(chunk: int, tiles_x: int):
    def kernel(
        offs_ref,
        chunks_ref,
        packed_ref,
        grgb_ref,
        glogt_ref,
        logt_ref,
        gout_ref,
        slab,
        gslab,
        sem,
        osem,
    ):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i * tiles_x + j
        off = offs_ref[t]
        n_chunks = chunks_ref[t]
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_W, 1), 0) + j * TILE_W
        ).astype(jnp.float32)
        y0 = (i * TILE_H).astype(jnp.float32)

        # blocks arrive H-major (…, TILE_H, TILE_W); MXU-transpose into the
        # kernel's pixels-on-sublanes orientation (TILE_W, TILE_H)
        gr_t = _mxu_t(grgb_ref[0])
        gg_t = _mxu_t(grgb_ref[1])
        gb_t = _mxu_t(grgb_ref[2])
        # cotangent of the logT output IS gB's initialization:
        # dL/dα through T is -(ḡ_T·T + Σ_behind w·(ḡ·c))/(1-α); ḡ_logT = ḡ_T·T.
        glogt0 = _mxu_t(glogt_ref[...])  # (TILE_W, TILE_H)
        logt_final = _mxu_t(logt_ref[...])

        def body(k, carry):
            gB_cols, logt_cols = carry  # tuple[TILE_H] of (TILE_W, 1)
            c = n_chunks - 1 - k  # reverse chunk order
            base = pl.multiple_of(off + c * chunk, chunk)
            dma = pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(base, chunk)], slab, sem
            )
            dma.start()
            dma.wait()
            s = slab[...]
            ca = s[_CA : _CA + 1, :]
            cb = s[_CB : _CB + 1, :]
            cc = s[_CC : _CC + 1, :]

            gB_cols = list(gB_cols)
            logt_cols = list(logt_cols)
            acc = jnp.zeros((9, chunk), jnp.float32)
            for r in range(TILE_H):
                alpha, l1m, dx, dy, raw, expp = _row_alpha(s, px, y0 + float(r))
                cum = _lane_cumsum(l1m)
                sum_l = cum[:, chunk - 1 : chunk]
                logt_in_r = logt_cols[r] - sum_l
                t_excl = jnp.exp(logt_in_r + cum - l1m)
                w = alpha * t_excl

                gr = gr_t[:, r : r + 1]  # (TILE_W, 1)
                gg = gg_t[:, r : r + 1]
                gb_ = gb_t[:, r : r + 1]
                gc = (
                    gr * s[_CR : _CR + 1, :]
                    + gg * s[_CG : _CG + 1, :]
                    + gb_ * s[_CB2 : _CB2 + 1, :]
                )
                u = w * gc
                cum_u = _lane_cumsum(u)
                total_u = cum_u[:, chunk - 1 : chunk]
                # color behind instance k (pre-dotted with ḡ): carried gB
                # plus the in-chunk suffix.
                gBk = gB_cols[r] + (total_u - cum_u)

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
                acc = acc + jnp.concatenate(rows, axis=0)  # (9, chunk)

                gB_cols[r] = gB_cols[r] + total_u
                logt_cols[r] = logt_in_r

            gslab[...] = jnp.concatenate(
                [acc, jnp.zeros((PACK_ROWS - 9, chunk), jnp.float32)], axis=0
            )
            odma = pltpu.make_async_copy(
                gslab, gout_ref.at[:, pl.ds(base, chunk)], osem
            )
            odma.start()
            odma.wait()
            return tuple(gB_cols), tuple(logt_cols)

        init = (
            tuple(glogt0[:, r : r + 1] for r in range(TILE_H)),
            tuple(logt_final[:, r : r + 1] for r in range(TILE_H)),
        )
        jax.lax.fori_loop(0, n_chunks, body, init)

    return kernel


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

    fwd_kernel = _make_fwd_kernel(chunk, tiles_x)
    bwd_kernel = _make_bwd_kernel(chunk, tiles_x)

    # image blocks are H-major: array (3, Hp, Wp), tile block (3, 8, 128)
    def rgb_map(i, j, *_):
        return (0, i, j)

    def pix_map(i, j, *_):
        return (i, j)

    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((3, TILE_H, TILE_W), rgb_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PACK_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    bwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, TILE_H, TILE_W), rgb_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), pix_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((PACK_ROWS, chunk), jnp.float32),
            pltpu.VMEM((PACK_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def run_forward(mean2d, depth, conic, radius, validf, colors, opacities):
        sg = jax.lax.stop_gradient
        binning = bin_gaussians(
            sg(mean2d), sg(depth), sg(radius), sg(validf) > 0.5,
            width, height, instance_cap, chunk,
        )
        packed = pack_instances(binning, mean2d, conic, colors, opacities)
        rgb, logt = pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            ],
            interpret=interpret,
        )(binning.tile_offsets, binning.tile_chunks, packed)
        return rgb, logt, binning, packed

    @jax.custom_vjp
    def rasterize(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, _, _ = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return rgb, logt

    def rasterize_fwd(mean2d, depth, conic, radius, validf, colors, opacities):
        rgb, logt, binning, packed = run_forward(
            mean2d, depth, conic, radius, validf, colors, opacities
        )
        return (rgb, logt), (binning.tile_offsets, binning.tile_chunks,
                             binning.dest_exp, binning.rank_offsets,
                             binning.order, packed, logt)

    def rasterize_bwd(res, cotangents):
        (tile_offsets, tile_chunks, dest_exp, rank_offsets, order,
         packed, logt) = res
        g_rgb, g_logt = cotangents
        gpacked = pl.pallas_call(
            bwd_kernel,
            grid_spec=bwd_grid_spec,
            out_shape=[jax.ShapeDtypeStruct((PACK_ROWS, padded_cap), jnp.float32)],
            interpret=interpret,
        )(tile_offsets, tile_chunks, packed, g_rgb, g_logt, logt)[0]

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
