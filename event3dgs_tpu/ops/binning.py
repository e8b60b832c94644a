"""Tile binning: depth-sorted instance expansion with static shapes.

The CUDA rasterizer builds per-tile Gaussian lists with a (tile|depth)-key
radix sort over a dynamically-sized instance buffer (SURVEY §2.3).  The
TPU-native equivalent here is fully static-shape XLA:

1. Gaussians are depth-sorted **once** globally (`argsort`).
2. Each Gaussian's covered tile-rect is expanded into *instances* via a
   gather: instance *i* finds its source Gaussian with a `searchsorted` into
   the running-offset table, so no dynamic allocation is needed — just a
   fixed `instance_cap` budget (overflow is counted and reported).
3. Instances (created in depth order) are stably sorted by tile id; within a
   tile they therefore remain depth-ordered.

**Tile geometry** is 32×32 pixels (Q = 1024 pixels per tile) — close to the
CUDA kernel's 16×16 but sized so a whole tile fills the (8,128)-vreg compute
layout of the Pallas kernels.  Unlike a (8,128) strip, a 32×32 tile keeps
the covered-tile count of a typical few-pixel-radius Gaussian low, which is
what the instance budget and all downstream stages scale with.

**Group padding**: tiles are grouped 8 consecutive ids per *tile group*; the
packed instance stream is padded to `chunk` multiples per **group** (not per
tile), so a compositing-kernel chunk may mix instances of up to 8 tiles.
The kernels resolve per-lane tile membership with one-hot matmuls and a
segmented (masked-triangular) transmittance scan; in exchange, lane padding
waste drops by ~8× and dead chunks almost vanish.  Pad slots point at a
sentinel Gaussian (index N) with zero opacity.

All arrays here are index/bookkeeping data — gradients never flow through
binning (the caller wraps it in stop_gradient).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

TILE_H = 32
TILE_W = 32
GROUP = 8  # tiles per group = one (8, Q) image-block row set

# Packed per-instance attribute rows (see pack_instances).
ROW_MX, ROW_MY = 0, 1
ROW_CA, ROW_CB, ROW_CC = 2, 3, 4
ROW_OPA = 5
ROW_R, ROW_G, ROW_B = 6, 7, 8
ROW_GL = 9  # group-local tile index (0..7), f32
PACK_ROWS = 16  # padded to a sublane multiple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class EllipseCull(NamedTuple):
    """Per-Gaussian data for the exact per-tile alpha cull.

    A (gaussian, tile) instance is droppable iff the minimum of
    Q(d) = ca·dx² + 2·cb·dx·dy + cc·dy² over the tile's pixel box exceeds
    ``qthr`` = 2·ln(255·opacity) — then α < 1/255 at every pixel and the
    compositing kernels would zero the contribution anyway.  ``nba``/``nbc``
    are the precomputed −cb/ca and −cb/cc (the per-edge minimizer slopes),
    so the expansion kernels evaluate the 4-edge closed form without
    divisions.  Degenerate conics carry ca=cb=cc=0 → Q ≡ 0, never culled.
    """

    ca: jnp.ndarray
    cb: jnp.ndarray
    cc: jnp.ndarray
    nba: jnp.ndarray
    nbc: jnp.ndarray
    qthr: jnp.ndarray


def rect_min_q(lx, hx, ly, hy, ca, cb, cc, nba, nbc):
    """Min of the (positive-semidefinite) quadratic over the box
    [lx, hx] × [ly, hy] (bounds relative to the Gaussian mean).

    Convexity ⇒ the min is 0 if the box contains the origin, else it lies
    on one of the four edges, where the 1-D minimizer is the clamped
    stationary point (dy* = −cb/cc·dx on a dx-edge and symmetrically).
    """
    inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (0.0 <= hy)

    def edge_x(e):
        dy = jnp.clip(nbc * e, ly, hy)
        return ca * e * e + 2.0 * cb * e * dy + cc * dy * dy

    def edge_y(e):
        dx = jnp.clip(nba * e, lx, hx)
        return ca * dx * dx + 2.0 * cb * dx * e + cc * e * e

    q = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)),
    )
    return jnp.where(inside, 0.0, q)


class Binning(NamedTuple):
    inst_gauss: jnp.ndarray  # [padded_cap] gaussian index per instance (N = pad)
    slab_tile: jnp.ndarray  # [padded_cap] tile id per packed slot (pad → group base)
    tile_offsets: jnp.ndarray  # [T] start of each tile's packed range
    tile_counts: jnp.ndarray  # [T] real instances per tile
    chunk_group: jnp.ndarray  # [padded_cap // chunk] tile-group id per chunk
    chunk_live: jnp.ndarray  # [padded_cap // chunk] 1 if chunk has a real inst
    n_used_chunks: jnp.ndarray  # scalar: chunks before the all-pad tail; the
    #   compositing kernels run a *dynamic* grid of exactly this many steps
    #   (every tile group keeps ≥1 chunk, so all image blocks are visited)
    overflow: jnp.ndarray  # scalar: instances dropped (budget exceeded)
    num_tiles_x: int
    num_tiles_y: int
    padded_cap: int
    # gradient-reduction bookkeeping (see ops/segscan.py):
    dest_exp: jnp.ndarray  # [instance_cap] packed slot of expansion-order inst
    rank_offsets: jnp.ndarray  # [N+1] instance range starts per depth rank
    order: jnp.ndarray  # [N] depth order (gaussian id per rank)


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return cdiv(width, TILE_W), cdiv(height, TILE_H)


def num_groups(width: int, height: int) -> int:
    tx, ty = tile_grid(width, height)
    return cdiv(tx * ty, GROUP)


def _group_layout(t_count, num_tiles: int, chunk: int):
    """Per-group chunk-padded layout from per-tile instance counts.

    Returns (tile_start[T], group_offsets[G+1]) where each group's packed
    range is chunk-aligned and ≥ one chunk (so the kernels visit — and
    therefore initialize — every image-block group).
    """
    g = cdiv(num_tiles, GROUP)
    padded = jnp.zeros((g * GROUP,), t_count.dtype).at[:num_tiles].set(t_count)
    by_group = padded.reshape(g, GROUP)
    group_count = by_group.sum(axis=1)
    group_padded = jnp.maximum((group_count + chunk - 1) // chunk, 1) * chunk
    group_offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jax.lax.associative_scan(jnp.add, group_padded).astype(jnp.int32)]
    )
    within = jnp.cumsum(by_group, axis=1) - by_group  # exclusive prefix
    tile_start = (group_offsets[:g, None] + within).reshape(-1)[:num_tiles]
    return tile_start.astype(jnp.int32), group_offsets


def _alpha_bbox_half_extents(conic, radius, opacities):
    """Per-axis half extents of the α ≥ 1/255 region, in pixels.

    The level set α = o·exp(−Q/2) = 1/255 is the ellipse Q = 2·ln(255·o)
    (Q = dᵀ·conic·d); its axis-aligned bounding box has half extents
    t·sqrt(cov_xx), t·sqrt(cov_yy) with t² = 2·ln(255·o) and cov = conic⁻¹.
    Intersecting the binning rect with this bbox drops only tiles where
    every pixel has α < 1/255 — which the compositing kernels skip anyway
    (ALPHA_MIN cutoff), so the cull is output-exact.  Falls back to the
    isotropic ``radius`` where the conic is degenerate.
    """
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det = ca * cc - cb * cb
    ok = det > 1e-12
    safe_det = jnp.where(ok, det, 1.0)
    t2 = 2.0 * jnp.maximum(
        jnp.log(255.0 * jnp.maximum(opacities, 1e-12)), 0.0
    ) if opacities is not None else jnp.full_like(ca, 2.0 * np.log(255.0))
    # cov_xx = cc/det, cov_yy = ca/det; +1 px absorbs f32 rounding
    wx = jnp.sqrt(jnp.maximum(t2 * cc / safe_det, 0.0)) + 1.0
    wy = jnp.sqrt(jnp.maximum(t2 * ca / safe_det, 0.0)) + 1.0
    return jnp.where(ok, wx, radius), jnp.where(ok, wy, radius)


def _tile_rect(mx, my, rx, ry, tiles_x, tiles_y):
    """CUDA getRect tile bounds for per-axis half extents (rx, ry)."""
    x0 = jnp.clip(jnp.floor((mx - rx) / TILE_W), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ry) / TILE_H), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + rx + TILE_W - 1) / TILE_W), 0, tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((my + ry + TILE_H - 1) / TILE_H), 0, tiles_y
    ).astype(jnp.int32)
    return x0, y0, x1, y1


def _binning_rect(mean2d, radius, conic, opacities, tiles_x, tiles_y):
    """The enumerated tile rect: the radius rect (the reference's support
    convention, mirrored by the oracle's in_rect mask) intersected with the
    α ≥ 1/255 bounding box (output-exact shrink, big for anisotropic
    splats whose 3σ_max circle rect overshoots the minor axis)."""
    mx, my = mean2d[:, 0], mean2d[:, 1]
    x0, y0, x1, y1 = _tile_rect(mx, my, radius, radius, tiles_x, tiles_y)
    if conic is not None:
        wx, wy = _alpha_bbox_half_extents(conic, radius, opacities)
        ex0, ey0, ex1, ey1 = _tile_rect(mx, my, wx, wy, tiles_x, tiles_y)
        x0 = jnp.maximum(x0, ex0)
        y0 = jnp.maximum(y0, ey0)
        x1 = jnp.minimum(x1, ex1)
        y1 = jnp.minimum(y1, ey1)
    return mx, my, x0, y0, x1, y1


def count_instances(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    conic: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scalar total of (tile, gaussian) instances for a projected scene.

    The cheap counting half of :func:`bin_gaussians`, for sizing
    ``instance_cap`` adaptively: the CUDA rasterizer allocates its
    instance buffer exactly per frame (SURVEY §2.3); the TPU equivalent is
    a static cap chosen from a recent count plus margin, re-jitted (rare)
    when the count outgrows it — every pipeline stage from expansion
    through gradient reduction scales with the cap, so a tight cap matters.
    Pass ``conic``/``opacities`` to match :func:`bin_gaussians`'s
    alpha-bbox rect (the count stays an upper bound on live instances —
    the per-tile ellipse cull inside expansion only removes more).
    """
    tiles_x, tiles_y = tile_grid(width, height)
    _, _, x0, y0, x1, y1 = _binning_rect(
        mean2d, radius, conic, opacities, tiles_x, tiles_y
    )
    counts = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    return jnp.where(valid, counts, 0).sum().astype(jnp.int32)


def suggest_instance_cap(total: int, margin: float = 1.3) -> int:
    """Round an observed instance count up by ``margin`` to a 1024 multiple."""
    return max(-(-int(int(total) * margin) // 1024) * 1024, 1024)


def bin_gaussians(
    mean2d: jnp.ndarray,  # [N, 2]
    depth: jnp.ndarray,  # [N] (+inf for culled)
    radius: jnp.ndarray,  # [N] (0 for culled)
    valid: jnp.ndarray,  # [N] bool
    width: int,
    height: int,
    instance_cap: int,
    chunk: int,
    use_counting_sort: bool | None = None,
    opacities: jnp.ndarray | None = None,
    conic: jnp.ndarray | None = None,
) -> Binning:
    n = mean2d.shape[0]
    tiles_x, tiles_y = tile_grid(width, height)
    num_tiles = tiles_x * tiles_y
    n_groups = cdiv(num_tiles, GROUP)

    # Fusion firewall: without it XLA fuses the projection math (EWA
    # einsums upstream of these inputs) into the 10⁶-element instance
    # gathers below and rematerializes it per gathered element — a >100×
    # slowdown observed on TPU.  The barrier forces the projection outputs
    # to materialize once.
    mean2d, depth, radius, valid = jax.lax.optimization_barrier(
        (mean2d, depth, radius, valid)
    )
    if conic is not None:
        conic = jax.lax.optimization_barrier(conic)
    if opacities is not None:
        opacities = jax.lax.optimization_barrier(opacities)

    # --- tile rects (in tile units): CUDA getRect radius rect ∩ alpha-bbox
    mx, my, x0, y0, x1, y1 = _binning_rect(
        mean2d, radius, conic, opacities, tiles_x, tiles_y
    )
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(valid, rw * rh, 0)

    # Exact per-tile ellipse cull inputs: a rect tile can be dropped iff
    # min over its (1 px-expanded) pixel box of Q(d) = dᵀ·conic·d exceeds
    # qthr = 2·ln(255·o) — every pixel there has α < 1/255, which the
    # compositing kernels skip anyway, so the cull is output-exact and
    # beats the round-3 circle test on anisotropic splats and rect corners.
    o = opacities if opacities is not None else jnp.ones_like(radius)
    qthr = 2.0 * jnp.maximum(jnp.log(255.0 * jnp.maximum(o, 1e-12)), 0.0)
    if conic is not None:
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        pd = (ca > 1e-12) & (cc > 1e-12) & (ca * cc - cb * cb > 1e-12)
        nba = jnp.where(pd, -cb / jnp.where(pd, ca, 1.0), 0.0)
        nbc = jnp.where(pd, -cb / jnp.where(pd, cc, 1.0), 0.0)
        ca = jnp.where(pd, ca, 0.0)
        cb = jnp.where(pd, cb, 0.0)
        cc = jnp.where(pd, cc, 0.0)
        # degenerate conics never cull (Q ≡ 0 ≤ qthr)
    else:
        z = jnp.zeros_like(radius)
        ca, cb, cc, nba, nbc = z, z, z, z, z
    ell = EllipseCull(ca=ca, cb=cb, cc=cc, nba=nba, nbc=nbc, qthr=qthr)

    # --- global depth sort -------------------------------------------------
    # Zero-count Gaussians (culled, or valid-but-empty-rect at the image
    # edge) must sort last: the Pallas expansion kernel relies on the source
    # rank increasing by at most 1 per instance within the live range.
    depth_eff = jnp.where(counts > 0, depth, jnp.inf)
    order = jnp.argsort(depth_eff)
    # ONE wide row gather reorders counts + every expansion attribute into
    # depth order: XLA TPU gathers cost ~10 ns per ROW regardless of width,
    # so 12 narrow 1-D gathers (the round-4 formulation) cost ~12× this
    # (measured ~10 ms at N=100k — it dominated the whole binning stage).
    table = jnp.stack(
        [
            counts.astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            rw.astype(jnp.float32),
            mx, my,
            ell.ca, ell.cb, ell.cc, ell.nba, ell.nbc, ell.qthr,
        ],
        axis=1,
    )  # [N, 12]; all integer entries < 2²⁴ → f32-exact
    table_o = jnp.take(table, order, axis=0)
    counts_o = table_o[:, 0].astype(counts.dtype)
    # associative_scan, NOT jnp.cumsum: XLA sometimes lowers large cumsums
    # to an O(n²) convolution on TPU (observed: ~130 ms for 100k elements)
    offsets = jnp.concatenate(
        [jnp.zeros(1, counts_o.dtype), jax.lax.associative_scan(jnp.add, counts_o)]
    )
    total = offsets[-1]

    padded_cap = instance_cap + n_groups * chunk  # static upper bound
    if use_counting_sort is None:
        use_counting_sort = padded_cap < (1 << 24) and instance_cap % 1024 == 0
    if use_counting_sort:
        # --- Pallas expansion: per-instance (tile, gaussian) ---------------
        from event3dgs_tpu.ops.expand import expand_instances

        interp_x = jax.default_backend() != "tpu"
        tile, g = expand_instances(
            offsets, order, table_o[:, 1:], instance_cap,
            tiles_x, num_tiles, tile_w=TILE_W, tile_h=TILE_H,
            interpret=interp_x,
        )
    else:
        # --- XLA expansion (gather-based) ----------------------------------
        inst = jnp.arange(instance_cap, dtype=jnp.int32)
        grank = jnp.clip(
            jnp.searchsorted(offsets, inst, side="right") - 1, 0, n - 1
        )
        live = inst < jnp.minimum(total, instance_cap)
        g = order[grank]
        j = inst - offsets[grank]
        grw = jnp.maximum(rw[g], 1)
        tx = x0[g] + j % grw
        ty = y0[g] + j // grw
        # same exact per-tile alpha cull as the Pallas expansion path
        # (1 px-expanded pixel box absorbs f32 rounding)
        px0 = (tx * TILE_W).astype(jnp.float32)
        py0 = (ty * TILE_H).astype(jnp.float32)
        mxg, myg = mx[g], my[g]
        qmin = rect_min_q(
            px0 - 1.0 - mxg, px0 + float(TILE_W) - mxg,
            py0 - 1.0 - myg, py0 + float(TILE_H) - myg,
            ell.ca[g], ell.cb[g], ell.cc[g], ell.nba[g], ell.nbc[g],
        )
        covered = qmin <= ell.qthr[g]
        live = live & covered
        tile = jnp.where(live, ty * tiles_x + tx, num_tiles).astype(jnp.int32)
        g = jnp.where(live, g, n).astype(jnp.int32)

    # --- stable sort by tile (preserves depth order within a tile) --------
    if use_counting_sort:
        # Pallas counting sort: histogram + stable in-tile rank; two orders
        # of magnitude faster than XLA's comparator sort on TPU.
        from event3dgs_tpu.ops.sort_tiles import counting_sort_buckets

        interp = jax.default_backend() != "tpu"
        t_count, dest_fn = counting_sort_buckets(
            tile, num_tiles, interp, n_live=total
        )
        tile_start, group_offsets = _group_layout(t_count, num_tiles, chunk)
        dest = dest_fn(tile_start, drop_dest=padded_cap)
        inst_gauss = jnp.full((padded_cap,), n, jnp.int32).at[dest].set(
            g, mode="drop"
        )
        dest_exp = dest  # expansion order == creation order in this path
    else:
        # XLA fallback: packed single-key sort when (tile, index) fits int32,
        # else argsort.
        idx_bits = max(int(instance_cap - 1).bit_length(), 1)
        tile_bits = int(num_tiles).bit_length()
        if idx_bits + tile_bits <= 31:
            key = (tile << idx_bits) | inst
            skey = jnp.sort(key)
            s_tile = skey >> idx_bits
            sort_idx = skey & ((1 << idx_bits) - 1)
        else:
            sort_idx = jnp.argsort(tile, stable=True)
            s_tile = tile[sort_idx]
        s_g = g[sort_idx]

        tid = jnp.arange(num_tiles, dtype=jnp.int32)
        t_start = jnp.searchsorted(s_tile, tid, side="left").astype(jnp.int32)
        t_end = jnp.searchsorted(s_tile, tid, side="right").astype(jnp.int32)
        t_count = t_end - t_start

        tile_start, group_offsets = _group_layout(t_count, num_tiles, chunk)
        pos_in_tile = jnp.arange(instance_cap, dtype=jnp.int32) - t_start[
            jnp.clip(s_tile, 0, num_tiles - 1)
        ]
        dest = jnp.where(
            s_tile < num_tiles,
            tile_start[jnp.clip(s_tile, 0, num_tiles - 1)] + pos_in_tile,
            padded_cap,
        )
        inst_gauss = jnp.full((padded_cap,), n, jnp.int32).at[dest].set(
            s_g, mode="drop"
        )
        # dest is in tile-sorted order; un-permute to expansion order
        dest_exp = (
            jnp.full((instance_cap,), padded_cap, dest.dtype)
            .at[sort_idx]
            .set(dest, mode="drop")
        )

    # per-chunk group id for the chunk-grid rasterizer: chunk k belongs to
    # the group whose (chunk-aligned) range contains it; trailing unused
    # chunks map to the last group (their slabs are all-sentinel → no-ops)
    n_chunks = padded_cap // chunk
    start_chunks = (group_offsets[:n_groups] // chunk).astype(jnp.int32)
    chunk_group = (
        jnp.searchsorted(
            start_chunks, jnp.arange(n_chunks, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )

    # liveness per chunk: whether it holds at least one real (non-sentinel)
    # instance — the rasterizer kernels skip all math on dead chunks
    t_pad = jnp.zeros((n_groups * GROUP,), t_count.dtype).at[:num_tiles].set(
        t_count
    )
    group_count = t_pad.reshape(n_groups, GROUP).sum(axis=1)
    kk = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk_live = (
        (kk - start_chunks[chunk_group]) * chunk < group_count[chunk_group]
    ).astype(jnp.int32)

    # tile id per packed slot (pad slots → their group's base tile so the
    # group-local index stays in [0, 8) and sentinel lanes are harmless).
    # Derived ARITHMETICALLY from the per-group tile starts — a slot's tile
    # is the last of its group's 8 tiles whose packed range starts at or
    # before it.  The round-4 formulation scattered tile ids through the
    # `dest` permutation (`.at[dest].set`), a ~10 ns/row serialized XLA
    # scatter (~1.3 ms here); this is a [n_chunks, chunk, 8] compare-sum —
    # a few million vector ops.  Empty tiles share their successor's start
    # and the compare-sum picks the later tile, exactly like
    # searchsorted(side="right") - 1.
    starts_pad = jnp.full(
        (n_groups * GROUP,), jnp.iinfo(jnp.int32).max, jnp.int32
    ).at[:num_tiles].set(tile_start)
    starts8 = starts_pad.reshape(n_groups, GROUP)[chunk_group]  # [n_chunks, 8]
    slots = (
        kk[:, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    )  # [n_chunks, chunk]
    loc = (
        jnp.sum(
            (starts8[:, None, :] <= slots[:, :, None]).astype(jnp.int32),
            axis=-1,
        )
        - 1
    )  # group-local tile index per slot
    slab_tile = (chunk_group[:, None] * GROUP + loc).reshape(-1)
    # broadcast, NOT a gather: chunk_group repeated chunk times per slot
    slot_group = jnp.broadcast_to(
        chunk_group[:, None], (n_chunks, chunk)
    ).reshape(-1)
    is_pad = inst_gauss >= n
    slab_tile = jnp.where(is_pad, slot_group * GROUP, slab_tile)

    return Binning(
        inst_gauss=inst_gauss,
        slab_tile=slab_tile,
        tile_offsets=tile_start,
        tile_counts=t_count.astype(jnp.int32),
        chunk_group=chunk_group,
        chunk_live=chunk_live,
        n_used_chunks=(group_offsets[n_groups] // chunk).astype(jnp.int32),
        overflow=jnp.maximum(total - instance_cap, 0),
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
        padded_cap=padded_cap,
        dest_exp=dest_exp,
        rank_offsets=offsets.astype(jnp.int32),
        order=order.astype(jnp.int32),
    )


def pack_instances(
    binning: Binning,
    mean2d: jnp.ndarray,  # [N, 2]
    conic: jnp.ndarray,  # [N, 3]
    colors: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N]
) -> jnp.ndarray:
    """Gather per-instance attributes into a [PACK_ROWS, padded_cap] slab.

    Attribute-major layout: the kernel's per-chunk DMA is one contiguous,
    lane-aligned (16, chunk) block whose *rows* are attributes — attribute
    row vectors broadcast directly against pixel sublane columns without any
    in-kernel transpose.  The sentinel Gaussian (index N) has opacity 0.

    The conic rows are stored **pre-scaled for the power form** the kernels
    evaluate (power = ca'·dx² + cb'·dx·dy + cc'·dy²): ca' = −ca/2,
    cb' = −cb, cc' = −cc/2.  This removes two multiplies per (pixel, lane)
    element from the VPU-bound compositing kernels; the backward kernel
    recovers ca = −2ca' etc. for the mean-gradient algebra.

    Means are stored **tile-local** (mean2d − tile origin): the kernels
    compute alphas in tile-local pixel coordinates, so lanes of different
    tiles coexist in one chunk.  Row ``ROW_GL`` carries the group-local tile
    index (0..7) that drives the kernels' one-hot tile resolution.
    """
    n = mean2d.shape[0]
    conic_scaled = conic * jnp.asarray([-0.5, -1.0, -0.5], conic.dtype)
    attrs = jnp.concatenate(
        [mean2d, conic_scaled, opacities[:, None], colors], axis=1
    )  # [N, 9]
    attrs = jnp.concatenate([attrs, jnp.zeros((1, attrs.shape[1]))], axis=0)
    gathered = attrs[binning.inst_gauss].astype(jnp.float32)  # [padded_cap, 9]
    t = binning.slab_tile
    ox = ((t % binning.num_tiles_x) * TILE_W).astype(jnp.float32)
    oy = ((t // binning.num_tiles_x) * TILE_H).astype(jnp.float32)
    gl = (t % GROUP).astype(jnp.float32)
    # pure concatenation — `.at[:, col].add()` column updates lower to XLA
    # scatters, which serialize at ~10 ns/row on TPU (measured ~4 ms at
    # this size; the whole gather above costs the same)
    out = jnp.concatenate(
        [
            gathered[:, :2] - jnp.stack([ox, oy], axis=1),
            gathered[:, 2:],
            gl[:, None],
        ],
        axis=1,
    )  # [padded_cap, 10]
    return jnp.pad(out.T, ((0, PACK_ROWS - out.shape[1]), (0, 0)))
