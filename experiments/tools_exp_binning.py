#!/usr/bin/env python
"""Cumulative bisect of the binning pipeline cost on TPU."""
import time
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp
from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops import binning as B

N=100_000; W,H=1920,1080; CHUNK=128; ICAP=385024
cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
rng = np.random.default_rng(0)
means = jnp.asarray(np.c_[rng.uniform(-3,3,N), rng.uniform(-1.8,1.8,N), rng.uniform(2,10,N)], jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(np.log(0.005), np.log(0.03), (N,1))) * rng.uniform(0.7,1.4,(N,3)), jnp.float32)
rots = jnp.asarray(rng.normal(size=(N,4)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3,0.9,N), jnp.float32)
colors = jnp.asarray(rng.uniform(0,1,(N,3)), jnp.float32)
interp = jax.default_backend() != "tpu"

def timed(name, fn, *args):
    out = fn(*args, jnp.float32(0.)); jax.block_until_ready(out)
    t0=time.perf_counter()
    for i in range(10):
        out = fn(*args, jnp.float32(1e-6*(i+1)))
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/10*1e3:9.2f} ms")

def upto(stage):
    @jax.jit
    def f(m, s, r, o, c, eps):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        mean2d, depth, radius, valid = jax.lax.optimization_barrier(
            (p.mean2d, p.depth, p.radius, p.valid))
        tiles_x, tiles_y = B.tile_grid(W, H)
        num_tiles = tiles_x * tiles_y
        n_groups = B.cdiv(num_tiles, B.GROUP)
        mx, my = mean2d[:, 0], mean2d[:, 1]
        x0 = jnp.clip(jnp.floor((mx - radius) / B.TILE_W), 0, tiles_x).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((my - radius) / B.TILE_H), 0, tiles_y).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((mx + radius + B.TILE_W - 1) / B.TILE_W), 0, tiles_x).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((my + radius + B.TILE_H - 1) / B.TILE_H), 0, tiles_y).astype(jnp.int32)
        rw = jnp.maximum(x1 - x0, 0); rh = jnp.maximum(y1 - y0, 0)
        counts = jnp.where(valid, rw * rh, 0)
        rcull = radius * float(np.sqrt(2*np.log(255))/3)
        if stage == "rects":
            return counts.sum()
        depth_eff = jnp.where(counts > 0, depth, jnp.inf)
        order = jnp.argsort(depth_eff)
        if stage == "argsort":
            return order.sum()
        counts_o = counts[order]
        offsets = jnp.concatenate([jnp.zeros(1, counts_o.dtype),
                                   jax.lax.associative_scan(jnp.add, counts_o)])
        if stage == "offsets":
            return offsets.sum()
        from event3dgs_tpu.ops.expand import expand_instances
        tile, g = expand_instances(offsets, order, x0, y0, rw, mean2d, rcull,
                                   ICAP, tiles_x, num_tiles,
                                   tile_w=B.TILE_W, tile_h=B.TILE_H,
                                   interpret=interp)
        if stage == "expand":
            return tile.sum() + g.sum()
        from event3dgs_tpu.ops.sort_tiles import counting_sort_buckets
        total = offsets[-1]
        t_count, dest_fn = counting_sort_buckets(tile, num_tiles, interp, n_live=total)
        if stage == "count":
            return t_count.sum()
        tile_start, group_offsets = B._group_layout(t_count, num_tiles, CHUNK)
        padded_cap = ICAP + n_groups * CHUNK
        dest = dest_fn(tile_start, drop_dest=padded_cap)
        if stage == "dest":
            return dest.sum()
        inst_gauss = jnp.full((padded_cap,), N, jnp.int32).at[dest].set(g, mode="drop")
        if stage == "scatter_g":
            return inst_gauss.sum()
        slab_tile = jnp.full((padded_cap,), 0, jnp.int32).at[dest].set(tile, mode="drop")
        if stage == "scatter_t":
            return inst_gauss.sum() + slab_tile.sum()
        b = B.bin_gaussians(mean2d, depth, radius, valid, W, H, ICAP, CHUNK, opacities=o)
        if stage == "full_bin":
            return sum(x.sum() for x in (b.inst_gauss, b.slab_tile, b.chunk_group, b.dest_exp, b.order))
        pk = B.pack_instances(b, mean2d, p.conic, c, o)
        return pk.sum()
    return f

for st in ("rects", "argsort", "offsets", "expand", "count", "dest",
           "scatter_g", "scatter_t", "full_bin", "pack"):
    timed(st, upto(st), means, scales, rots, opac, colors)
