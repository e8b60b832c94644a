"""Tests for the projection preprocess and the slow-oracle rasterizer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops import project_gaussians, rasterize_reference, render, render_depth
from event3dgs_tpu.core.sh import rgb_to_sh


W, H = 64, 48


def simple_camera(width=W, height=H):
    # Camera at origin looking down +z (COLMAP convention).
    return make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, width, height)


def one_gaussian(xyz=(0.0, 0.0, 3.0), scale=0.1, opacity=0.9, color=(1.0, 0.2, 0.1)):
    means = jnp.array([xyz])
    scales = jnp.full((1, 3), scale)
    rots = jnp.array([[1.0, 0, 0, 0]])
    opac = jnp.array([opacity])
    colors = jnp.array([color])
    return means, scales, rots, opac, colors


class TestProjection:
    def test_center_point_projects_to_center(self):
        cam = simple_camera()
        means, scales, rots, *_ = one_gaussian()
        proj = project_gaussians(means, scales, rots, cam)
        # ndc (0,0) → pixel ((S-1)/2)
        np.testing.assert_allclose(
            np.array(proj.mean2d[0]), [(W - 1) / 2, (H - 1) / 2], atol=1e-3
        )
        assert bool(proj.valid[0])
        assert float(proj.depth[0]) == pytest.approx(3.0, abs=1e-5)

    def test_behind_camera_culled(self):
        cam = simple_camera()
        means, scales, rots, *_ = one_gaussian(xyz=(0, 0, -3.0))
        proj = project_gaussians(means, scales, rots, cam)
        assert not bool(proj.valid[0])
        assert float(proj.radius[0]) == 0.0
        assert np.isinf(float(proj.depth[0]))

    def test_near_plane_culled(self):
        cam = simple_camera()
        means, scales, rots, *_ = one_gaussian(xyz=(0, 0, 0.1))
        proj = project_gaussians(means, scales, rots, cam)
        assert not bool(proj.valid[0])

    def test_far_off_screen_culled(self):
        cam = simple_camera()
        means, scales, rots, *_ = one_gaussian(xyz=(100.0, 0, 3.0))
        proj = project_gaussians(means, scales, rots, cam)
        assert not bool(proj.valid[0])

    def test_radius_grows_with_scale(self):
        cam = simple_camera()
        r = []
        for s in (0.05, 0.1, 0.2):
            means, scales, rots, *_ = one_gaussian(scale=s)
            r.append(float(project_gaussians(means, scales, rots, cam).radius[0]))
        assert r[0] < r[1] < r[2]

    def test_closer_gaussian_bigger_radius(self):
        cam = simple_camera()
        means, scales, rots, *_ = one_gaussian(xyz=(0, 0, 2.0))
        r_near = float(project_gaussians(means, scales, rots, cam).radius[0])
        means, scales, rots, *_ = one_gaussian(xyz=(0, 0, 8.0))
        r_far = float(project_gaussians(means, scales, rots, cam).radius[0])
        assert r_near > r_far

    def test_conic_is_inverse_covariance(self):
        cam = simple_camera()
        # isotropic gaussian: conic b term ~0 and a≈c
        means, scales, rots, *_ = one_gaussian(scale=0.15)
        proj = project_gaussians(means, scales, rots, cam)
        a, b, c = np.array(proj.conic[0])
        assert abs(b) < 1e-4
        assert a == pytest.approx(c, rel=0.35)  # fx≠fy ⇒ mild anisotropy


class TestRasterize:
    def _render_simple(self, **kw):
        cam = simple_camera()
        means, scales, rots, opac, colors = one_gaussian(**kw)
        proj = project_gaussians(means, scales, rots, cam)
        bg = jnp.zeros(3)
        return np.array(
            rasterize_reference(proj, colors, opac, bg, cam.width, cam.height)
        )

    def test_peak_at_center(self):
        # odd dims → the projected center (0,0) ndc lands exactly on a pixel
        cam = simple_camera(65, 49)
        means, scales, rots, opac, colors = one_gaussian()
        proj = project_gaussians(means, scales, rots, cam)
        img = np.array(
            rasterize_reference(proj, colors, opac, jnp.zeros(3), cam.width, cam.height)
        )
        cy, cx = np.unravel_index(img[:, :, 0].argmax(), img.shape[:2])
        assert (cx, cy) == (32, 24)
        # peak alpha = opacity exactly at the center pixel → color*0.9
        np.testing.assert_allclose(img[cy, cx], [0.9, 0.18, 0.09], atol=0.01)

    def test_background_far_from_gaussian(self):
        cam = simple_camera()
        means, scales, rots, opac, colors = one_gaussian(scale=0.02)
        proj = project_gaussians(means, scales, rots, cam)
        bg = jnp.array([0.3, 0.5, 0.7])
        img = np.array(
            rasterize_reference(proj, colors, opac, bg, cam.width, cam.height)
        )
        np.testing.assert_allclose(img[0, 0], [0.3, 0.5, 0.7], atol=1e-5)

    def test_depth_ordering_front_wins(self):
        cam = simple_camera()
        means = jnp.array([[0.0, 0, 5.0], [0.0, 0, 2.0]])  # back first in array
        scales = jnp.full((2, 3), 0.3)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        opac = jnp.array([0.95, 0.95])
        colors = jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]])  # back red, front green
        proj = project_gaussians(means, scales, rots, cam)
        img = np.array(
            rasterize_reference(proj, colors, opac, jnp.zeros(3), cam.width, cam.height)
        )
        c = img[(H - 1) // 2, (W - 1) // 2]
        assert c[1] > 0.9  # front green dominates
        assert c[0] < 0.1

    def test_alpha_clamp_099(self):
        # opacity 1.0 must clamp to 0.99 at the peak
        img = self._render_simple(opacity=1.0, color=(1.0, 1.0, 1.0), scale=0.3)
        assert img.max() <= 0.99 + 1e-5

    def test_invisible_when_culled(self):
        img = self._render_simple(xyz=(0, 0, -5.0))
        assert img.max() == 0.0

    def test_transmittance_early_stop(self):
        # many opaque layers: the image must stay bounded and T → ~0,
        # so background contributes nothing
        cam = simple_camera()
        n = 50
        means = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.linspace(2.0, 4.0, n)], axis=1
        )
        scales = jnp.full((n, 3), 0.5)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n,), 0.99)
        colors = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        proj = project_gaussians(means, scales, rots, cam)
        img = np.array(
            rasterize_reference(
                proj, colors, opac, jnp.array([1.0, 0, 0]), cam.width, cam.height
            )
        )
        center = img[(H - 1) // 2, (W - 1) // 2]
        assert center[2] > 0.99  # fully saturated blue
        assert center[0] < 1e-3  # background never leaks through

    def test_grad_flows_to_all_inputs(self):
        cam = simple_camera(32, 24)
        means, _, _, opac, colors = one_gaussian(scale=0.2)
        # anisotropic + tilted: otherwise the rotation gradient is exactly 0
        scales = jnp.array([[0.3, 0.1, 0.2]])
        rots = jnp.array([[0.9, 0.1, 0.3, 0.2]])

        def loss(m, s, r, o, c):
            proj = project_gaussians(m, s, r, cam)
            img = rasterize_reference(proj, c, o, jnp.zeros(3), cam.width, cam.height)
            return jnp.sum(img**2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            means, scales, rots, opac, colors
        )
        for g, name in zip(grads, ["means", "scales", "rots", "opac", "colors"]):
            assert np.isfinite(np.array(g)).all(), name
            assert np.abs(np.array(g)).max() > 0, name

    @pytest.mark.parametrize("argnum,name", [(0, "means"), (3, "opacity"), (4, "colors")])
    def test_grad_matches_finite_difference(self, argnum, name):
        cam = simple_camera(24, 16)
        means = jnp.array([[0.05, -0.1, 3.0], [-0.3, 0.2, 4.0]])
        scales = jnp.full((2, 3), 0.25)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        opac = jnp.array([0.6, 0.7])
        colors = jnp.array([[0.9, 0.1, 0.2], [0.1, 0.8, 0.9]])
        args = [means, scales, rots, opac, colors]

        def loss(*a):
            proj = project_gaussians(a[0], a[1], a[2], cam)
            img = rasterize_reference(
                proj, a[4], a[3], jnp.array([0.1, 0.1, 0.1]), cam.width, cam.height
            )
            return jnp.sum(jnp.sin(3.0 * img))

        g_auto = np.array(jax.grad(loss, argnums=argnum)(*args))
        # central finite differences
        x = np.array(args[argnum], np.float64)
        eps = 3e-4
        g_fd = np.zeros_like(x)
        for idx in np.ndindex(x.shape):
            for sgn in (+1, -1):
                xp = x.copy()
                xp[idx] += sgn * eps
                a2 = list(args)
                a2[argnum] = jnp.array(xp, jnp.float32)
                g_fd[idx] += sgn * float(loss(*a2))
            g_fd[idx] /= 2 * eps
        np.testing.assert_allclose(g_auto, g_fd, rtol=0.05, atol=2e-2)


class TestRenderAPI:
    def test_render_with_sh(self):
        cam = simple_camera()
        n = 3
        means = jnp.array([[0.0, 0, 3.0], [0.5, 0.2, 4.0], [-0.4, -0.3, 5.0]])
        feats = jnp.zeros((n, 16, 3)).at[:, 0, :].set(rgb_to_sh(jnp.array([0.8, 0.4, 0.2])))
        opac = jnp.full((n,), 0.8)
        scales = jnp.full((n, 3), 0.2)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        out = render(means, feats, opac, scales, rots, cam, jnp.zeros(3), sh_degree=0)
        img = np.array(out.image)
        assert img.shape == (H, W, 3)
        cy, cx = (H - 1) // 2, (W - 1) // 2
        # dc color 0.8/0.4/0.2 × alpha 0.8 at the first gaussian's peak
        np.testing.assert_allclose(img[cy, cx], [0.64, 0.32, 0.16], atol=0.05)
        assert np.array(out.visibility).all()
        assert (np.array(out.radii) > 0).all()

    def test_mean2d_tap_gradient(self):
        cam = simple_camera(32, 24)
        means, scales, rots, opac, colors = one_gaussian(scale=0.2)
        feats = jnp.zeros((1, 16, 3)).at[:, 0, :].set(rgb_to_sh(colors))
        tap = jnp.zeros((1, 2))

        def loss(tap):
            out = render(
                means, feats, opac, scales, rots, cam, jnp.zeros(3),
                sh_degree=0, mean2d_tap=tap,
            )
            # asymmetric spatial loss so the tap gradient is nonzero
            wgt = jnp.arange(cam.width, dtype=jnp.float32)[None, :, None]
            return jnp.sum(out.image * wgt)

        g = np.array(jax.grad(loss)(tap))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

    def test_render_depth(self):
        cam = simple_camera(65, 49)  # odd: gaussian center exactly on a pixel
        means, scales, rots, opac, _ = one_gaussian(xyz=(0, 0, 3.0), opacity=0.99)
        out = render_depth(means, opac, scales, rots, cam, jnp.zeros(3))
        img = np.array(out.image)
        cy, cx = 24, 32
        # composited distance ≈ 0.99 × (3 + 0.5)
        np.testing.assert_allclose(img[cy, cx], 0.99 * 3.5, rtol=0.02)
