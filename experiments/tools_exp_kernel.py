#!/usr/bin/env python
"""Kernel-variant experiments: attribute fwd-kernel cost to ops.

Builds hacked copies of the fwd compositing kernel with ops ablated or
replaced, runs them on the real binning data, and times each (pipelined
timing, scalar outputs consumed via .sum()).
"""
import os, time
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.binning import (PACK_ROWS, bin_gaussians,
                                       pack_instances, tile_grid)
from event3dgs_tpu.ops import rasterize_tiled as rt

N = 100_000
W, H = 1920, 1080
ITERS = int(os.environ.get("ITERS", 10))
CHUNK = 128
cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
rng = np.random.default_rng(0)
means = jnp.asarray(np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                          rng.uniform(2, 10, N)], jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(np.log(0.005), np.log(0.03), (N, 1)))
                     * rng.uniform(0.7, 1.4, (N, 3)), jnp.float32)
rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.9, N), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
icap = -(-8 * N // 1024) * 1024
interp = jax.default_backend() != "tpu"

tiles_x, tiles_y = tile_grid(W, H)
n_groups = -(-(tiles_x * tiles_y) // rt.GROUP)
padded_cap = icap + n_groups * CHUNK
total_chunks = padded_cap // CHUNK
fwd_grid_spec, _ = rt.build_grid_specs(CHUNK, total_chunks)


@jax.jit
def residuals(m, s, r, o, c):
    p = project_gaussians(m, s, r, cam, opacities=o)
    b = bin_gaussians(p.mean2d, p.depth, p.radius, p.valid, W, H, icap, CHUNK)
    packed = pack_instances(b, p.mean2d, p.conic, c, o)
    return b, packed


b, packed = residuals(means, scales, rots, opac, colors)
_Q, GROUP = rt._Q, rt.GROUP
_MX, _MY, _CA, _CB, _CC, _OPA, _CR, _CG, _CB2, _GL = range(10)


def make_kernel(variant):
    def kernel(cg_ref, live_ref, packed_ref, rgb_ref, logt_ref, work_ref,
               acc_r, acc_g, acc_b, ltc):
        k = pl.program_id(0)
        g = cg_ref[k]
        is_first = jnp.logical_or(k == 0, g != cg_ref[jnp.maximum(k - 1, 0)])
        is_last = jnp.logical_or(
            k == total_chunks - 1,
            g != cg_ref[jnp.minimum(k + 1, total_chunks - 1)])

        @pl.when(is_first)
        def _():
            acc_r[...] = jnp.zeros_like(acc_r)
            acc_g[...] = jnp.zeros_like(acc_g)
            acc_b[...] = jnp.zeros_like(acc_b)
            ltc[...] = jnp.zeros_like(ltc)

        lt = ltc[...]
        do_work = (live_ref[k] > 0) & (jnp.max(lt) > rt.LOG_T_SKIP)
        work_ref[k] = do_work.astype(jnp.int32)

        @pl.when(do_work)
        def _():
            s = packed_ref[...]
            px, py = rt._tile_px()
            mx = s[_MX:_MX+1, :]; my = s[_MY:_MY+1, :]
            ca = s[_CA:_CA+1, :]; cb = s[_CB:_CB+1, :]; cc = s[_CC:_CC+1, :]
            opa = s[_OPA:_OPA+1, :]
            dx = mx - px; dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            if variant in ("noexp", "nolog", "noexp2"):
                expp = power * 0.1  # ablate: no transcendental
            else:
                expp = jnp.exp(power)
            raw = opa * expp
            alpha = jnp.minimum(rt.ALPHA_MAX, raw)
            alpha = jnp.where((power > 0.0) | (alpha < rt.ALPHA_MIN), 0.0, alpha)
            if variant in ("nolog",):
                l1m = -alpha  # ablate log1p
            else:
                l1m = jnp.log1p(-alpha)
            if variant == "noscan":
                oneh, onehT, _ = rt._group_masks(s, CHUNK)
                cum = l1m
                lt_sel = jnp.zeros_like(l1m)
            elif variant == "nomxu":
                cum = l1m
                lt_sel = jnp.zeros_like(l1m)
                oneh = onehT = None
            else:
                oneh, onehT, seg = rt._group_masks(s, CHUNK)
                cum = rt._split_dot(l1m, seg)
                lt_sel = rt._split_dot(lt, oneh)
            if variant in ("noexp2", "nolog"):
                w = alpha * (lt_sel + cum - l1m)  # ablate second exp
            else:
                w = alpha * jnp.exp(lt_sel + cum - l1m)
            if variant == "nomxu":
                acc_r[...] = acc_r[...] + jnp.sum(w * s[_CR:_CR+1, :],
                                                  axis=1, keepdims=True)
                acc_g[...] = acc_g[...] + jnp.sum(w * s[_CG:_CG+1, :],
                                                  axis=1, keepdims=True)
                acc_b[...] = acc_b[...] + jnp.sum(w * s[_CB2:_CB2+1, :],
                                                  axis=1, keepdims=True)
                ltc[...] = lt + jnp.sum(l1m, axis=1, keepdims=True)
            else:
                for acc, row in ((acc_r, _CR), (acc_g, _CG), (acc_b, _CB2)):
                    u = w * s[row:row+1, :]
                    acc[...] = acc[...] + rt._split_dot(u, onehT)
                ltc[...] = lt + rt._split_dot(l1m, onehT)

        @pl.when(is_last)
        def _():
            rgb_ref[0] = rt._t_from8(acc_r[...])
            rgb_ref[1] = rt._t_from8(acc_g[...])
            rgb_ref[2] = rt._t_from8(acc_b[...])
            logt_ref[...] = rt._t_from8(ltc[...])

    return kernel


def run(variant):
    kern = make_kernel(variant)

    @jax.jit
    def f(ct, live, pk, eps):
        rgb, logt, work = pl.pallas_call(
            kern, grid_spec=fwd_grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((3, n_groups * GROUP, _Q), jnp.float32),
                jax.ShapeDtypeStruct((n_groups * GROUP, _Q), jnp.float32),
                jax.ShapeDtypeStruct((total_chunks,), jnp.int32)],
            interpret=interp)(ct, live, pk + eps)
        return rgb.sum() + logt.sum() + work.sum()

    out = f(b.chunk_group, b.chunk_live, packed, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(b.chunk_group, b.chunk_live, packed, jnp.float32(1e-6 * (i+1)))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"fwd[{variant:8s}] {dt*1e3:9.2f} ms")
    return dt


run("base")
run("noscan")   # scan/sel dots ablated
run("nomxu")    # all dots ablated
run("noexp")    # exp(power) -> mul
run("noexp2")   # also second exp -> add
run("nolog")    # all 3 transcendentals ablated
