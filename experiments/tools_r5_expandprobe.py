#!/usr/bin/env python
"""R5: expand-kernel cost attribution probes (TIMING ONLY — some variants
produce wrong values by design; they isolate cost terms)."""
import os
import time
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _scene
from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (
    _binning_rect, EllipseCull, count_instances, suggest_instance_cap,
    tile_grid,
)
from event3dgs_tpu.ops import expand as ex

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 10))

cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
means, scales, rots, opac, colors = map(
    lambda a: jnp.asarray(a, jnp.float32), _scene(np, jnp))
interp = jax.default_backend() != "tpu"
tiles_x, tiles_y = tile_grid(W, H)
num_tiles = tiles_x * tiles_y


@jax.jit
def _prep(m, s, r, o):
    p = project_gaussians(m, s, r, cam, opacities=o)
    mean2d, depth, radius, valid = p.mean2d, p.depth, p.radius, p.valid
    conic = p.conic
    mx, my, x0, y0, x1, y1 = _binning_rect(mean2d, radius, conic, o,
                                           tiles_x, tiles_y)
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(valid, rw * rh, 0)
    qthr = 2.0 * jnp.maximum(jnp.log(255.0 * jnp.maximum(o, 1e-12)), 0.0)
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    pd = (ca > 1e-12) & (cc > 1e-12) & (ca * cc - cb * cb > 1e-12)
    nba = jnp.where(pd, -cb / jnp.where(pd, ca, 1.0), 0.0)
    nbc = jnp.where(pd, -cb / jnp.where(pd, cc, 1.0), 0.0)
    ca = jnp.where(pd, ca, 0.0)
    cb = jnp.where(pd, cb, 0.0)
    cc = jnp.where(pd, cc, 0.0)
    depth_eff = jnp.where(counts > 0, depth, jnp.inf)
    order = jnp.argsort(depth_eff)
    counts_o = counts[order]
    offsets = jnp.concatenate(
        [jnp.zeros(1, counts_o.dtype),
         jax.lax.associative_scan(jnp.add, counts_o)])
    return (offsets, order, x0, y0, rw, mean2d,
            ca, cb, cc, nba, nbc, qthr)

(offsets, order, x0, y0, rw, mean2d, ca, cb, cc, nba, nbc, qthr) = \
    jax.block_until_ready(_prep(means, scales, rots, opac))
ell = EllipseCull(ca=ca, cb=cb, cc=cc, nba=nba, nbc=nbc, qthr=qthr)
icap = suggest_instance_cap(int(offsets[-1]))
print("cap", icap, "total", int(offsets[-1]))


def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return dt


def run_variant(name, force_needb=None, passes=3, do_transpose=True,
                do_cull=True):
    """Monkeypatch-free rebuild of the expand call with probe knobs."""

    def kernel_factory(tiles_x, num_tiles, n, tile_w, tile_h):
        BLOCK, WIN, ATTR_ROWS = ex.BLOCK, ex.WIN, ex.ATTR_ROWS

        def kernel(klo_ref, total_ref, needb_ref, win_a, win_b,
                   tile_ref, g_ref):
            b = pl.program_id(0)
            total = total_ref[0]

            @pl.when(b * BLOCK >= total)
            def _dead():
                tile_ref[...] = jnp.full((8, 128), float(num_tiles),
                                         jnp.float32)
                g_ref[...] = jnp.full((8, 128), float(n), jnp.float32)

            @pl.when(b * BLOCK < total)
            def _live():
                ic = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
                      + b * BLOCK)
                icf = ic.astype(jnp.float32)

                def gather_window(s):
                    offs_row = s[0:1, :]
                    offs2_row = s[1:2, :]
                    onehot = ((offs_row <= icf).astype(jnp.float32)
                              - (offs2_row <= icf).astype(jnp.float32)
                              ).astype(jnp.bfloat16)
                    sh = s.astype(jnp.bfloat16)
                    r1 = s - sh.astype(jnp.float32)
                    sm = r1.astype(jnp.bfloat16)
                    sl = (r1 - sm.astype(jnp.float32)).astype(jnp.bfloat16)
                    dims = (((1,), (1,)), ((), ()))
                    d = lambda m: jax.lax.dot_general(
                        onehot, m, dims, preferred_element_type=jnp.float32)
                    out = d(sh)
                    if passes >= 2:
                        out = out + d(sm)
                    if passes >= 3:
                        out = out + d(sl)
                    return out

                a = gather_window(win_a[...])
                a = a + jax.lax.cond(
                    needb_ref[b] > 0,
                    lambda: gather_window(win_b[...]),
                    lambda: jnp.zeros((BLOCK, ATTR_ROWS), jnp.float32),
                )
                off_g = a[:, 0:1]
                gsel = a[:, 2:3]
                x0c = a[:, 3:4]
                y0c = a[:, 4:5]
                rwc = jnp.maximum(a[:, 5:6], 1.0)
                j = icf - off_g
                jy = jnp.floor(j / rwc)
                jx = j - jy * rwc
                txc = x0c + jx
                tyc = y0c + jy
                tile = tyc * float(tiles_x) + txc
                if do_cull:
                    mx = a[:, 6:7]
                    my = a[:, 7:8]
                    cca = a[:, 8:9]
                    ccb = a[:, 9:10]
                    ccc = a[:, 10:11]
                    cnba = a[:, 11:12]
                    cnbc = a[:, 12:13]
                    cqt = a[:, 13:14]
                    px0 = txc * float(tile_w)
                    py0 = tyc * float(tile_h)
                    lx = px0 - 1.0 - mx
                    hx = px0 + float(tile_w) - mx
                    ly = py0 - 1.0 - my
                    hy = py0 + float(tile_h) - my
                    inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (
                        0.0 <= hy)
                    dy_l = jnp.clip(cnbc * lx, ly, hy)
                    dy_h = jnp.clip(cnbc * hx, ly, hy)
                    dx_l = jnp.clip(cnba * ly, lx, hx)
                    dx_h = jnp.clip(cnba * hy, lx, hx)
                    q_xl = cca * lx * lx + 2 * ccb * lx * dy_l + ccc * dy_l**2
                    q_xh = cca * hx * hx + 2 * ccb * hx * dy_h + ccc * dy_h**2
                    q_yl = cca * dx_l**2 + 2 * ccb * dx_l * ly + ccc * ly * ly
                    q_yh = cca * dx_h**2 + 2 * ccb * dx_h * hy + ccc * hy * hy
                    qmin = jnp.minimum(jnp.minimum(q_xl, q_xh),
                                       jnp.minimum(q_yl, q_yh))
                    qmin = jnp.where(inside, 0.0, qmin)
                    covered = qmin <= cqt
                else:
                    covered = jnp.ones_like(tile) > 0
                live = (ic < total) & covered
                tile = jnp.where(live, tile, float(num_tiles))
                gsel = jnp.where(live, gsel, float(n))
                if do_transpose:
                    tile_rows, g_rows = [], []
                    for r in range(8):
                        sl_ = slice(r * 128, (r + 1) * 128)
                        tile_rows.append(ex._mxu_t(tile[sl_]))
                        g_rows.append(ex._mxu_t(gsel[sl_]))
                    tile_ref[...] = jnp.concatenate(tile_rows, axis=0)
                    g_ref[...] = jnp.concatenate(g_rows, axis=0)
                else:
                    # WRONG layout (timing only): broadcast a reduction
                    tile_ref[...] = jnp.zeros((8, 128), jnp.float32) + \
                        jnp.sum(tile)
                    g_ref[...] = jnp.zeros((8, 128), jnp.float32) + \
                        jnp.sum(gsel)

        return kernel

    n = order.shape[0]
    n_blocks = icap // ex.BLOCK
    n_pad = (-(-(n + 1) // ex.WIN) + 1) * ex.WIN
    kernel = kernel_factory(tiles_x, num_tiles, n, 32, 32)

    @jax.jit
    def prog(offsets, order, x0, y0, rw, mean2d, eps):
        big = jnp.float32(3e24)
        offs_row = jnp.full((n_pad,), big, jnp.float32).at[:n + 1].set(
            offsets.astype(jnp.float32) + 0 * eps)

        def rowf(src):
            return jnp.zeros((n_pad,), jnp.float32).at[:n].set(
                src[order].astype(jnp.float32))

        offs2_row = jnp.full((n_pad,), big, jnp.float32).at[:n].set(
            offsets[1:].astype(jnp.float32))
        attrs = jnp.zeros((ex.ATTR_ROWS, n_pad), jnp.float32)
        for i, src in enumerate([None, None, order.astype(jnp.float32),
                                 x0, y0, rw, mean2d[:, 0], mean2d[:, 1],
                                 ell.ca, ell.cb, ell.cc, ell.nba, ell.nbc,
                                 ell.qthr]):
            if i == 0:
                attrs = attrs.at[0].set(offs_row)
            elif i == 1:
                attrs = attrs.at[1].set(offs2_row)
            else:
                attrs = attrs.at[i].set(
                    jnp.zeros((n_pad,), jnp.float32).at[:n].set(
                        src if i == 2 else src[order].astype(jnp.float32)))
        block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * ex.BLOCK
        grank_start = jnp.clip(
            jnp.searchsorted(offsets, block_starts, side="right") - 1,
            0, n - 1).astype(jnp.int32)
        k_lo = jnp.clip((grank_start // ex.WIN) * ex.WIN, 0,
                        n_pad - 2 * ex.WIN).astype(jnp.int32)
        total = jnp.minimum(offsets[-1], icap).astype(jnp.int32)
        block_ends = jnp.minimum(block_starts + (ex.BLOCK - 1),
                                 jnp.maximum(total - 1, 0))
        grank_end = jnp.clip(
            jnp.searchsorted(offsets, block_ends, side="right") - 1,
            0, n - 1).astype(jnp.int32)
        if force_needb is None:
            need_b = (grank_end + 1 >= k_lo + ex.WIN).astype(jnp.int32)
        else:
            need_b = jnp.full((n_blocks,), force_needb, jnp.int32)

        @ex.vma_index_map
        def win_map_a(i, klo, total, needb):
            return (0, klo[i] // ex.WIN)

        @ex.vma_index_map
        def win_map_b(i, klo, total, needb):
            return (0, klo[i] // ex.WIN + needb[i])

        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((ex.ATTR_ROWS, ex.WIN), win_map_a,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ex.ATTR_ROWS, ex.WIN), win_map_b,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((8, 128),
                                 ex.vma_index_map(lambda i, *_: (i, 0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128),
                                 ex.vma_index_map(lambda i, *_: (i, 0)),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32),
            ],
            interpret=interp,
        )
        t, g = fn(k_lo, total[None], need_b, attrs, attrs)
        return t.sum() + g.sum()

    return timed(name, prog, offsets, order, x0, y0, rw, mean2d)


base = run_variant("current (3-split, dyn winB, transpose)")
run_variant("no window B (timing only)", force_needb=0)
run_variant("1-pass gather (timing only)", passes=1)
run_variant("no output transpose (timing only)", do_transpose=False)
run_variant("no cull math (timing only)", do_cull=True, passes=3,
            force_needb=None) if False else None
run_variant("no cull (timing only)", do_cull=False)
