"""Equivalence of the fast (Pallas expansion + counting sort) and XLA
binning paths — they implement the same algorithm and must agree exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.binning import bin_gaussians
from event3dgs_tpu.ops.projection import project_gaussians


def make_proj(n=300, seed=0, w=256, h=64):
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, w, h)
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.c_[rng.uniform(-1.5, 1.5, n), rng.uniform(-0.6, 0.6, n),
              rng.uniform(2, 8, n)], jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.02), np.log(0.3), (n, 1)))
        * rng.uniform(0.7, 1.4, (n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32)
    return cam, project_gaussians(means, scales, rots, cam, opacities=opac)


@pytest.mark.parametrize("seed", [0, 1])
def test_fast_path_matches_xla_path(seed):
    cam, proj = make_proj(seed=seed)
    kw = dict(width=cam.width, height=cam.height, instance_cap=4096, chunk=128)
    fast = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=True, **kw)
    slow = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=False, **kw)
    np.testing.assert_array_equal(np.array(fast.tile_counts),
                                  np.array(slow.tile_counts))
    np.testing.assert_array_equal(np.array(fast.tile_offsets),
                                  np.array(slow.tile_offsets))
    np.testing.assert_array_equal(np.array(fast.inst_gauss),
                                  np.array(slow.inst_gauss))
    np.testing.assert_array_equal(np.array(fast.slab_tile),
                                  np.array(slow.slab_tile))
    np.testing.assert_array_equal(np.array(fast.chunk_group),
                                  np.array(slow.chunk_group))
    np.testing.assert_array_equal(np.array(fast.chunk_live),
                                  np.array(slow.chunk_live))
    assert int(fast.overflow) == int(slow.overflow)


def test_overflow_counted_identically():
    cam, proj = make_proj(n=500, seed=2)
    kw = dict(width=cam.width, height=cam.height, instance_cap=1024, chunk=128)
    fast = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=True, **kw)
    slow = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=False, **kw)
    assert int(fast.overflow) == int(slow.overflow)
    assert int(fast.overflow) > 0  # the budget is genuinely exceeded
    np.testing.assert_array_equal(np.array(fast.inst_gauss),
                                  np.array(slow.inst_gauss))


def make_aniso_proj(n=200, seed=5, w=256, h=96, ratio=8.0):
    """Strongly anisotropic splats: the 3σ_max circle rect vastly
    overestimates the minor axis, so the ellipse cull must bite."""
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, w, h)
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.c_[rng.uniform(-1.2, 1.2, n), rng.uniform(-0.5, 0.5, n),
              rng.uniform(2, 6, n)], jnp.float32)
    base = np.exp(rng.uniform(np.log(0.05), np.log(0.25), (n, 1)))
    aniso = np.stack([
        np.full(n, 1.0), np.full(n, 1.0 / ratio), np.full(n, 1.0)
    ], axis=1)
    scales = jnp.asarray(base * aniso, jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    return cam, project_gaussians(means, scales, rots, cam, opacities=opac), opac


def test_ellipse_cull_paths_agree_and_cut_instances():
    """With conic/opacities the exact per-tile alpha cull must (a) keep the
    fast and XLA paths identical, (b) cut a large fraction of the radius
    rect's instances on anisotropic splats, and (c) keep every contributing
    instance — pinned transitively by the rasterizer-vs-oracle parity tests
    (the oracle masks only by radius-rect + alpha >= 1/255)."""
    from event3dgs_tpu.ops.binning import count_instances

    cam, proj, opac = make_aniso_proj()
    kw = dict(width=cam.width, height=cam.height, instance_cap=8192,
              chunk=128, opacities=opac, conic=proj.conic)
    fast = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=True, **kw)
    slow = bin_gaussians(proj.mean2d, proj.depth, proj.radius, proj.valid,
                         use_counting_sort=False, **kw)
    np.testing.assert_array_equal(np.array(fast.inst_gauss),
                                  np.array(slow.inst_gauss))
    np.testing.assert_array_equal(np.array(fast.tile_counts),
                                  np.array(slow.tile_counts))
    assert int(fast.overflow) == int(slow.overflow) == 0

    n = proj.mean2d.shape[0]
    live = int((np.array(fast.inst_gauss) < n).sum())
    rect_count = int(count_instances(
        proj.mean2d, proj.radius, proj.valid, cam.width, cam.height
    ))
    bbox_count = int(count_instances(
        proj.mean2d, proj.radius, proj.valid, cam.width, cam.height,
        conic=proj.conic, opacities=opac,
    ))
    # the alpha-bbox rect alone must cut the circle rect substantially on
    # 8:1 splats, and the per-tile ellipse test cuts further (measured on
    # this fixture: rect 1031 → bbox 745 → live 697)
    assert bbox_count < 0.8 * rect_count, (bbox_count, rect_count)
    assert live <= bbox_count
    assert live < 0.7 * rect_count
    assert live > 0
