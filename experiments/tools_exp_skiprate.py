"""Measure the chunk early-out's actual fire rate (PROFILE_r4).

Both the round-3 group-wide and the round-4 per-tile chunk skip showed no
step-time change on the 1080p bench scenes; this prints the measured
fraction of live chunks whose work flag is 0 — if it is ~0, the
explanation is structural: a 32×32 tile's max-pixel logT must drop below
ln 1e-6 for a skip, and tiles at splat-coverage boundaries essentially
always keep at least one near-transparent pixel.

Run on TPU: python experiments/tools_exp_skiprate.py  [OPAQUE=1]
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.binning import (
    bin_gaussians, count_instances, pack_instances, suggest_instance_cap,
)
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops import rasterize_tiled as rt

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080


def main():
    from experiments.tools_exp_ellcull import scene  # same fixtures

    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
    means, scales, rots, opac, colors = scene()
    proj = jax.jit(
        lambda m, s, r, o: project_gaussians(m, s, r, cam, opacities=o)
    )(means, scales, rots, opac)
    icap = suggest_instance_cap(int(count_instances(
        proj.mean2d, proj.radius, proj.valid, W, H, conic=proj.conic,
        opacities=opac,
    )))

    binning = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, proj.valid, W, H, icap,
        rt.DEFAULT_CHUNK, opacities=opac, conic=proj.conic,
    )
    packed = pack_instances(binning, proj.mean2d, proj.conic, colors, opac)
    n_used = int(binning.n_used_chunks)
    live = np.asarray(binning.chunk_live)[:n_used]

    from event3dgs_tpu.ops.pallas_util import out_struct
    from jax.experimental import pallas as pl

    total_chunks = binning.padded_cap // rt.DEFAULT_CHUNK
    fwd_grid_spec, _ = rt.build_grid_specs(
        rt.DEFAULT_CHUNK, total_chunks, total_chunks
    )
    n_groups = (binning.num_tiles_x * binning.num_tiles_y + rt.GROUP - 1) \
        // rt.GROUP
    nu = jnp.full((1,), total_chunks, jnp.int32)
    rgb, logt, work = pl.pallas_call(
        rt._make_fwd_kernel(rt.DEFAULT_CHUNK, total_chunks),
        grid_spec=fwd_grid_spec,
        out_shape=[
            out_struct((3, n_groups * rt.GROUP, rt._Q), jnp.float32,
                       frozenset()),
            out_struct((n_groups * rt.GROUP, rt._Q), jnp.float32,
                       frozenset()),
            out_struct((total_chunks,), jnp.int32, frozenset()),
        ],
        interpret=rt._interpret_default(),
    )(binning.chunk_group, binning.chunk_live, nu, packed)
    w = np.asarray(work)[:n_used]
    skipped_live = int(((w == 0) & (live > 0)).sum())
    print(f"chunks used={n_used} live={int(live.sum())} "
          f"skipped_live={skipped_live} "
          f"({skipped_live / max(int(live.sum()), 1):.3%} of live)")


if __name__ == "__main__":
    main()
