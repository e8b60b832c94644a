#!/usr/bin/env python
"""R5: binning-internal attribution at the bench shape (loop-pipelined
timing: queue ITERS async dispatches, block once — removes the ~25-30 ms
relay round-trip that per-call-sync timing carries).

Each program extends the previous by one binning sub-stage.
"""
import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp

from bench import _scene
from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (
    _binning_rect, _group_layout, EllipseCull, bin_gaussians, pack_instances,
    count_instances, suggest_instance_cap, GROUP, cdiv, tile_grid,
)
from event3dgs_tpu.ops.expand import expand_instances
from event3dgs_tpu.ops.sort_tiles import counting_sort_buckets

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 10))
CHUNK = 128

cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
means, scales, rots, opac, colors = map(
    lambda a: jnp.asarray(a, jnp.float32), _scene(np, jnp))
interp = jax.default_backend() != "tpu"

tiles_x, tiles_y = tile_grid(W, H)
num_tiles = tiles_x * tiles_y
n_groups = cdiv(num_tiles, GROUP)


@jax.jit
def _count(m, s, r, o):
    p = project_gaussians(m, s, r, cam, opacities=o)
    return count_instances(p.mean2d, p.radius, p.valid, W, H,
                           conic=p.conic, opacities=o)

icap = int(os.environ.get("CAP", 0)) or suggest_instance_cap(
    int(_count(means, scales, rots, opac)))
icap = -(-icap // 1024) * 1024
padded_cap = icap + n_groups * CHUNK
print(f"cap {icap} padded {padded_cap}")


def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def _upto(stage):
    """Build a jitted program running binning sub-stages 0..stage."""

    @jax.jit
    def prog(m, s, r, o, eps):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        mean2d, depth, radius, valid = jax.lax.optimization_barrier(
            (p.mean2d, p.depth, p.radius, p.valid))
        conic = jax.lax.optimization_barrier(p.conic)
        opacities = jax.lax.optimization_barrier(o)
        mx, my, x0, y0, x1, y1 = _binning_rect(
            mean2d, radius, conic, opacities, tiles_x, tiles_y)
        rw = jnp.maximum(x1 - x0, 0)
        rh = jnp.maximum(y1 - y0, 0)
        counts = jnp.where(valid, rw * rh, 0)
        if stage == 0:
            return counts.sum()
        qthr = 2.0 * jnp.maximum(
            jnp.log(255.0 * jnp.maximum(opacities, 1e-12)), 0.0)
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        pd = (ca > 1e-12) & (cc > 1e-12) & (ca * cc - cb * cb > 1e-12)
        nba = jnp.where(pd, -cb / jnp.where(pd, ca, 1.0), 0.0)
        nbc = jnp.where(pd, -cb / jnp.where(pd, cc, 1.0), 0.0)
        ca = jnp.where(pd, ca, 0.0)
        cb = jnp.where(pd, cb, 0.0)
        cc = jnp.where(pd, cc, 0.0)
        ell = EllipseCull(ca=ca, cb=cb, cc=cc, nba=nba, nbc=nbc, qthr=qthr)
        depth_eff = jnp.where(counts > 0, depth, jnp.inf)
        order = jnp.argsort(depth_eff)
        counts_o = counts[order]
        offsets = jnp.concatenate(
            [jnp.zeros(1, counts_o.dtype),
             jax.lax.associative_scan(jnp.add, counts_o)])
        total = offsets[-1]
        if stage == 1:  # + depth sort & offsets
            return offsets.sum() + order.sum()
        table = jnp.stack(
            [x0.astype(jnp.float32), y0.astype(jnp.float32),
             rw.astype(jnp.float32),
             mx, my, ell.ca, ell.cb, ell.cc, ell.nba, ell.nbc, ell.qthr],
            axis=1)
        tile, g = expand_instances(
            offsets, order, jnp.take(table, order, axis=0), icap,
            tiles_x, num_tiles, tile_w=32, tile_h=32, interpret=interp)
        if stage == 2:  # + pallas expansion
            return tile.sum() + g.sum()
        t_count, dest_fn = counting_sort_buckets(
            tile, num_tiles, interp, n_live=total)
        if stage == 3:  # + counting-sort histogram/rank
            return t_count.sum()
        tile_start, group_offsets = _group_layout(t_count, num_tiles, CHUNK)
        dest = dest_fn(tile_start, drop_dest=padded_cap)
        if stage == 4:  # + dest computation
            return dest.sum()
        inst_gauss = jnp.full((padded_cap,), N, jnp.int32).at[dest].set(
            g, mode="drop")
        if stage == 5:  # + inst_gauss scatter
            return inst_gauss.sum()
        b = bin_gaussians(mean2d, depth, radius, valid, W, H, icap, CHUNK,
                          opacities=opacities, conic=conic)
        if stage == 6:  # full binning (from barriered inputs)
            return b.inst_gauss.sum() + b.chunk_live.sum() + b.slab_tile.sum()
        packed = pack_instances(b, mean2d, conic, colors, opacities)
        return packed.sum()

    return prog


ts = []
names = ["proj+rect", "+depth sort/offsets", "+expand kernel",
         "+counting hist/rank", "+dest", "+inst_gauss scatter",
         "full binning", "+pack"]
for i, nm in enumerate(names):
    ts.append(timed(nm, _upto(i), means, scales, rots, opac))
print("--- deltas ---")
for i in range(1, len(ts)):
    print(f"{names[i]:40s} {1e3*(ts[i]-ts[i-1]):8.2f} ms")
