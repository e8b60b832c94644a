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
