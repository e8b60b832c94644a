"""Tests for the Gaussian model: init, activations, Adam, densify, PLY IO."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from event3dgs_tpu.models import (
    AdamState,
    DensifyStats,
    GaussianParams,
    activated,
    adam_init,
    adam_update,
    densify_and_prune,
    init_from_point_cloud,
    init_stats,
    num_alive,
    reset_opacity,
    update_stats,
)
from event3dgs_tpu.models.gaussians import trainable_dict, with_trainable
from event3dgs_tpu.data import load_gaussian_ply, save_gaussian_ply


def small_model(n=10, capacity=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3))
    cols = rng.uniform(0, 1, size=(n, 3))
    return init_from_point_cloud(pts, cols, capacity=capacity, max_sh_degree=3)


class TestInit:
    def test_init_shapes_and_alive(self):
        p = small_model(10, 32)
        assert p.capacity == 32
        assert int(num_alive(p)) == 10
        assert p.features_rest.shape == (32, 15, 3)

    def test_activations(self):
        p = small_model()
        a = activated(p)
        # opacity init = 0.1 for alive, 0 for dead
        np.testing.assert_allclose(np.array(a.opacities[:10]), 0.1, atol=1e-6)
        np.testing.assert_allclose(np.array(a.opacities[10:]), 0.0, atol=1e-7)
        assert (np.array(a.scales) > 0).all()

    def test_scales_from_knn(self):
        # clustered points → small scales; far-apart points → big scales
        near = init_from_point_cloud(
            np.random.default_rng(0).normal(size=(20, 3)) * 0.01,
            np.full((20, 3), 0.5), capacity=20)
        far = init_from_point_cloud(
            np.random.default_rng(0).normal(size=(20, 3)) * 10.0,
            np.full((20, 3), 0.5), capacity=20)
        assert float(jnp.mean(near.scaling[:20])) < float(jnp.mean(far.scaling[:20]))


class TestAdam:
    def test_adam_first_step_magnitude(self):
        # With Adam, the first step is ≈ lr regardless of grad magnitude.
        p = {"w": jnp.array([1.0, 2.0])}
        g = {"w": jnp.array([0.3, -0.8])}
        st = adam_init(p)
        lr = {"w": 0.01}
        p2, st2 = adam_update(p, g, st, lr)
        step = np.array(p2["w"]) - np.array([1.0, 2.0])
        np.testing.assert_allclose(np.abs(step), 0.01, rtol=1e-5)
        assert np.sign(step[0]) == -1 and np.sign(step[1]) == 1
        assert int(st2.count) == 1

    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        w0 = np.array([0.5, -1.2, 3.0], np.float32)
        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.Adam([tw], lr=0.05, eps=1e-15)
        jw = {"w": jnp.array(w0)}
        jst = adam_init(jw)
        rng = np.random.default_rng(0)
        for _ in range(5):
            g = rng.normal(size=3).astype(np.float32)
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()
            jw, jst = adam_update(jw, {"w": jnp.array(g)}, jst, {"w": 0.05})
        np.testing.assert_allclose(np.array(jw["w"]), tw.detach().numpy(), rtol=1e-5)

    def test_zero_grad_zero_moments_no_move(self):
        p = {"w": jnp.array([1.0])}
        st = adam_init(p)
        p2, _ = adam_update(p, {"w": jnp.zeros(1)}, st, {"w": 0.1})
        np.testing.assert_allclose(np.array(p2["w"]), [1.0])


class TestDensify:
    def _stats_with_grad(self, p, hot_idx, grad=1.0):
        c = p.capacity
        s = init_stats(c)
        g = np.zeros((c, 2), np.float32)
        g[hot_idx, 0] = grad
        radii = np.zeros(c, np.float32)
        radii[: int(num_alive(p))] = 5.0
        vis = np.array(p.alive)
        return update_stats(s, jnp.array(g), jnp.array(radii), jnp.array(vis))

    def test_clone_small_hot_gaussian(self):
        p = small_model(10, 32)
        # make gaussian 0 small (scale well below percent_dense * extent)
        p = p.replace(scaling=p.scaling.at[0].set(jnp.log(1e-4)))
        stats = self._stats_with_grad(p, hot_idx=0)
        opt = adam_init(trainable_dict(p))
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=0.0,
        )
        assert int(num_alive(res.params)) == 11  # one clone added
        assert int(res.overflow) == 0
        # clone landed in first free slot (10) with identical xyz
        np.testing.assert_allclose(
            np.array(res.params.xyz[10]), np.array(p.xyz[0]), atol=1e-6
        )

    def test_split_large_hot_gaussian(self):
        p = small_model(10, 32)
        p = p.replace(scaling=p.scaling.at[0].set(jnp.log(1.0)))  # big
        stats = self._stats_with_grad(p, hot_idx=0)
        opt = adam_init(trainable_dict(p))
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=0.0,
        )
        # original dies, two children born: 10 - 1 + 2 = 11.  The freed slot 0
        # is immediately reclaimed by the first child; the second child takes
        # the first spare slot (10).
        assert int(num_alive(res.params)) == 11
        for slot in (0, 10):
            assert bool(res.params.alive[slot])
            np.testing.assert_allclose(
                np.array(jnp.exp(res.params.scaling[slot])), 1.0 / 1.6, rtol=1e-5
            )
        # children are resampled around the parent, not identical to it
        assert not np.allclose(np.array(res.params.xyz[0]), np.array(p.xyz[0]))

    def test_prune_low_opacity(self):
        p = small_model(10, 32)
        low = jnp.log(jnp.asarray(0.001) / (1 - 0.001))
        p = p.replace(opacity=p.opacity.at[3].set(low))
        stats = init_stats(p.capacity)
        opt = adam_init(trainable_dict(p))
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=0.0,
        )
        assert int(num_alive(res.params)) == 9
        assert not bool(res.params.alive[3])

    def test_screen_size_prune(self):
        p = small_model(10, 32)
        c = p.capacity
        stats = init_stats(c)
        radii = np.zeros(c, np.float32)
        radii[2] = 50.0  # > max_screen_size 20
        stats = update_stats(stats, jnp.zeros((c, 2)), jnp.array(radii), p.alive)
        opt = adam_init(trainable_dict(p))
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=20.0,
        )
        assert not bool(res.params.alive[2])

    def test_overflow_reported(self):
        p = small_model(10, 11)  # only one free slot
        p = p.replace(scaling=jnp.full_like(p.scaling, jnp.log(1e-4)))
        stats = self._stats_with_grad(p, hot_idx=list(range(10)))
        opt = adam_init(trainable_dict(p))
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=0.0,
        )
        assert int(num_alive(res.params)) == 11
        assert int(res.overflow) == 9

    def test_moments_zeroed_for_new_slots(self):
        p = small_model(10, 32)
        p = p.replace(scaling=p.scaling.at[0].set(jnp.log(1e-4)))
        stats = self._stats_with_grad(p, hot_idx=0)
        opt = adam_init(trainable_dict(p))
        # dirty the moments
        opt = AdamState(
            mu=jax.tree.map(lambda x: x + 1.0, opt.mu),
            nu=jax.tree.map(lambda x: x + 2.0, opt.nu),
            count=opt.count,
        )
        res = densify_and_prune(
            p, opt, stats, jax.random.PRNGKey(0),
            grad_threshold=0.5, min_opacity=0.005, extent=5.0, max_screen_size=0.0,
        )
        np.testing.assert_allclose(np.array(res.opt_state.mu["xyz"][10]), 0.0)
        np.testing.assert_allclose(np.array(res.opt_state.mu["xyz"][5]), 1.0)

    def test_jit_compatible(self):
        p = small_model(10, 32)
        stats = init_stats(p.capacity)
        opt = adam_init(trainable_dict(p))
        fn = jax.jit(
            densify_and_prune,
            static_argnames=("grad_threshold", "min_opacity", "extent",
                            "max_screen_size", "percent_dense"),
        )
        res = fn(p, opt, stats, jax.random.PRNGKey(0),
                 grad_threshold=0.5, min_opacity=0.005, extent=5.0,
                 max_screen_size=0.0)
        assert int(num_alive(res.params)) == 10


class TestDensifyGradScale:
    def test_stats_resolution_independent(self):
        """The densify threshold (2e-4) must be resolution-independent, as
        in the reference whose CUDA backward pre-scales mean2D gradients by
        (0.5W, 0.5H) (`backward.cu: ddelx_dx = 0.5*W`).  The same scene
        rendered at two resolutions yields pixel-space tap gradients that
        differ by ~the resolution ratio; after update_stats' grad_scale
        they must agree."""
        from event3dgs_tpu.core import make_camera
        from event3dgs_tpu.models.densify import DensifyStats, update_stats
        from event3dgs_tpu.ops import project_gaussians
        from event3dgs_tpu.ops.rasterize_reference import rasterize_reference

        rng = np.random.default_rng(0)
        n = 12
        means = jnp.asarray(np.c_[rng.uniform(-0.5, 0.5, n),
                                  rng.uniform(-0.3, 0.3, n),
                                  rng.uniform(2, 4, n)], jnp.float32)
        scales = jnp.asarray(np.full((n, 3), 0.08), jnp.float32)
        rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        opac = jnp.asarray(rng.uniform(0.4, 0.9, n), jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        bg = jnp.zeros(3)

        def accum(w, h):
            cam = make_camera(np.eye(3), np.zeros(3), 1.0, 1.0, w, h)

            def loss(tap):
                proj = project_gaussians(means, scales, rots, cam)
                proj = proj._replace(mean2d=proj.mean2d + tap)
                img = rasterize_reference(proj, colors, opac, bg, w, h)
                # mean-normalized photometric loss (resolution-invariant)
                return jnp.mean(jnp.abs(img - 0.25))

            g = jax.grad(loss)(jnp.zeros((n, 2)))
            stats = DensifyStats(
                grad_accum=jnp.zeros(n), denom=jnp.zeros(n),
                max_radii2d=jnp.zeros(n),
            )
            proj = project_gaussians(means, scales, rots, cam)
            return update_stats(stats, g, proj.radius, proj.valid,
                                grad_scale=(0.5 * w, 0.5 * h))

        lo = accum(64, 64)
        hi = accum(128, 128)
        a = np.asarray(lo.grad_accum)
        b = np.asarray(hi.grad_accum)
        mask = (np.asarray(lo.denom) > 0) & (np.asarray(hi.denom) > 0)
        assert mask.sum() >= 8
        # NDC-scaled norms agree across resolutions up to discretization
        # error (a 64px render quantizes splat support coarsely): median
        # ratio ~1 and no element off by more than 2x.  Without grad_scale
        # the ratio would be ~2 everywhere (the bug this pins: raw
        # pixel-space norms scale with resolution, starving densification
        # at the reference's 2e-4 threshold).
        ratio = b[mask] / np.maximum(a[mask], 1e-12)
        assert 0.8 < float(np.median(ratio)) < 1.25, ratio
        assert float(ratio.max()) < 2.0 and float(ratio.min()) > 0.5, ratio


class TestResetOpacity:
    def test_clamps_and_zeroes_moments(self):
        p = small_model(10, 32)
        high = jnp.log(jnp.asarray(0.9) / (1 - 0.9))
        p = p.replace(opacity=jnp.full_like(p.opacity, high))
        opt = adam_init(trainable_dict(p))
        opt = AdamState(
            mu=jax.tree.map(lambda x: x + 1.0, opt.mu), nu=opt.nu, count=opt.count
        )
        p2, opt2 = reset_opacity(p, opt)
        a = activated(p2)
        assert float(jnp.max(a.opacities)) <= 0.01 + 1e-6
        np.testing.assert_allclose(np.array(opt2.mu["opacity"]), 0.0)
        np.testing.assert_allclose(np.array(opt2.mu["xyz"]), 1.0)


class TestPlyIO:
    def test_roundtrip(self, tmp_path):
        p = small_model(10, 32, seed=3)
        path = str(tmp_path / "point_cloud.ply")
        save_gaussian_ply(path, p)
        p2 = load_gaussian_ply(path, capacity=32)
        assert int(num_alive(p2)) == 10
        for f in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                  "opacity"):
            np.testing.assert_allclose(
                np.array(getattr(p2, f))[:10],
                np.array(getattr(p, f))[:10],
                atol=1e-6, err_msg=f,
            )

    def test_schema_matches_reference(self, tmp_path):
        from event3dgs_tpu.data.ply import read_ply

        p = small_model(4, 8)
        path = str(tmp_path / "pc.ply")
        save_gaussian_ply(path, p)
        v = read_ply(path)
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert list(v.keys()) == expected
        assert all(a.dtype == np.float32 for a in v.values())
