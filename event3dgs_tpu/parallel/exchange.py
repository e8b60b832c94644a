"""Exact Gaussian-sharded rendering via per-view projected-splat exchange.

The reference composites every Gaussian of a view in one global per-view
depth order — the CUDA rasterizer's (tile, depth)-key sort re-sorts every
render (`/root/reference/gaussian_renderer/__init__.py:38-97`).  Any scheme
that merges *image-space* partials of statically-partitioned Gaussian shards
can only approximate that order: on inward-facing rigs (full orbits — the
project's own default scenes) the shards of every static space partition
interleave in depth along view rays, so no per-shard merge order is correct
for all pixels (see ``parallel.compose`` for the approximate path and its
measured error).

This module is the exact path.  Storage stays sharded — parameters, Adam
moments and densify stats keep their O(N/K) per-device footprint and are
never gathered — but the *view-space splats* are exchanged per view:

1. Each shard projects its local Gaussians for every peer view of its
   ``gauss`` group (K small projections) and packs the per-splat raster
   inputs (mean2d, depth, conic, radius, valid, color) into one
   [K, C/K, 11] f32 array.
2. One ``all_to_all`` over ``gauss`` turns "my Gaussians, all views" into
   "all Gaussians, my view" — slot-major order is restored exactly, so the
   rasterizer sees the identical splat sequence as an unsharded render.
3. Each device rasterizes the full splat set for its own view with the
   production tiled kernel: global per-view (tile, depth) sort, identical
   compositing semantics, *exact* parity with the single-device render on
   any scene geometry (orbit rigs included).

The ``gauss`` axis therefore renders K distinct views per step instead of
replicating work: a (data=D, gauss=K) mesh consumes D·K views per step.

Communication per camera per device: 11·C/K·4 bytes of all_to_all (C =
total capacity) plus one C-sized opacity all_gather **per render call**
(three per view in event mode) — independent of image resolution, and it
rides the ICI ``gauss`` axis.  Gradients flow
back through the collectives (all_to_all transposes to the reverse
all_to_all, all_gather to psum_scatter), so each shard receives exactly the
summed sensitivities of all peer views to its own Gaussians — verified
against the unsharded renderer in ``tests/test_parallel.py`` on full-orbit
scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from event3dgs_tpu.ops.projection import ProjectedGaussians, project_gaussians
from event3dgs_tpu.ops.render import gaussian_colors


class ExchangeRender(NamedTuple):
    """One device's exact full-scene render of its own view."""

    rgb: jnp.ndarray  # [H, W, 3] pre-background accumulated color
    logt: jnp.ndarray  # [H, W] log final transmittance
    radii_own: jnp.ndarray  # [K, C/K] own-slot pixel radii per group view
    vis_own: jnp.ndarray  # [K, C/K] own-slot visibility per group view


def render_view_exchange(
    means3d: jnp.ndarray,  # [C/K, 3] this shard's Gaussian centers
    features: jnp.ndarray,  # [C/K, F, 3] SH coefficients (degree-masked)
    opacities: jnp.ndarray,  # [C/K] activated opacities
    scales: jnp.ndarray,  # [C/K, 3] activated scales
    rotations: jnp.ndarray,  # [C/K, 4] quaternions
    cameras,  # stacked Camera pytree (replicated)
    view_idx,  # [] int32, this device's view
    axis_name: str,
    axis_size: int,
    sh_degree: int,
    taps: jnp.ndarray | None = None,  # [K, C/K, 2] screen-grad taps
    rasterizer: str = "tiled",
    instance_cap: int | None = None,
) -> ExchangeRender:
    """Render this device's view from the full (sharded) Gaussian set.

    Must run inside ``shard_map`` with the Gaussian capacity dimension
    sharded over ``axis_name``; ``view_idx`` varies per device.  When
    ``taps`` is given, gradients w.r.t. ``taps[j]`` are this shard's
    screen-space mean gradients under group view j (densification stats).
    """
    ids = jax.lax.all_gather(view_idx, axis_name)  # [K] group view ids

    packs, radii_l, vis_l = [], [], []
    for j in range(axis_size):
        cam_j = jax.tree.map(lambda x: x[ids[j]], cameras)
        proj = project_gaussians(
            means3d, scales, rotations, cam_j, opacities=opacities
        )
        if taps is not None:
            proj = proj._replace(mean2d=proj.mean2d + taps[j])
        colors = gaussian_colors(
            sh_degree, features, means3d, cam_j.camera_center
        )
        packs.append(
            jnp.concatenate(
                [
                    proj.mean2d,  # 0:2
                    proj.depth[:, None],  # 2
                    proj.conic,  # 3:6
                    proj.radius[:, None],  # 6
                    proj.valid.astype(jnp.float32)[:, None],  # 7
                    colors,  # 8:11
                ],
                axis=-1,
            )
        )
        radii_l.append(proj.radius)
        vis_l.append(proj.valid)

    stacked = jnp.stack(packs)  # [K, C/K, 11] (view-major, my slots)
    # all_to_all: view j's chunk goes to device j; received chunks stack
    # source-major, i.e. ascending slot blocks — the exact unsharded order.
    full = jax.lax.all_to_all(stacked, axis_name, split_axis=0, concat_axis=0)
    c_total = full.shape[0] * full.shape[1]
    full = full.reshape(c_total, 11)

    proj_full = ProjectedGaussians(
        mean2d=full[:, 0:2],
        depth=full[:, 2],
        conic=full[:, 3:6],
        radius=full[:, 6],
        valid=full[:, 7] > 0.5,
    )
    colors_full = full[:, 8:11]
    opac_full = jax.lax.all_gather(opacities, axis_name, tiled=True)

    cam_mine = jax.tree.map(lambda x: x[view_idx], cameras)
    if rasterizer == "tiled":
        from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled_partials

        rgb, logt = rasterize_tiled_partials(
            proj_full, colors_full, opac_full,
            cam_mine.width, cam_mine.height, instance_cap=instance_cap,
        )
    else:
        from event3dgs_tpu.ops.rasterize_reference import (
            rasterize_reference_partials,
        )

        rgb, logt = rasterize_reference_partials(
            proj_full, colors_full, opac_full,
            cam_mine.width, cam_mine.height,
        )
    return ExchangeRender(
        rgb=rgb,
        logt=logt,
        radii_own=jnp.stack(radii_l),
        vis_own=jnp.stack(vis_l),
    )
