"""Golden tests for core math vs. independent numpy implementations of the
reference formulas (reference: /root/reference/utils/{graphics,general,sh}_utils.py)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from event3dgs_tpu.core import (
    build_covariance,
    covariance_to_symm6,
    eval_sh,
    exponential_lr,
    fov2focal,
    focal2fov,
    inverse_sigmoid,
    make_camera,
    perspective_projection,
    quat_to_rotmat,
    rgb_to_sh,
    sh_to_rgb,
    world_to_view,
)
from event3dgs_tpu.core.sh import SH_C0


def _ref_world2view(R, t, translate=np.zeros(3), scale=1.0):
    # numpy transcription of graphics_utils.py:38-49 (column-vector form)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def _ref_projection(znear, zfar, fovX, fovY):
    # numpy transcription of graphics_utils.py:51-71 (column-vector form)
    tanY, tanX = math.tan(fovY / 2), math.tan(fovX / 2)
    top, right = tanY * znear, tanX * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 2 * znear / (2 * right)
    P[1, 1] = 2 * znear / (2 * top)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestTransforms:
    def test_world_to_view_matches_reference(self):
        rng = np.random.default_rng(0)
        R = _random_rotation(rng)
        t = rng.normal(size=3)
        ours = np.array(world_to_view(R, t))
        ref = _ref_world2view(R, t).T  # we store the transpose
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_world_to_view_recenter(self):
        rng = np.random.default_rng(1)
        R = _random_rotation(rng)
        t = rng.normal(size=3)
        translate = rng.normal(size=3)
        ours = np.array(world_to_view(R, t, translate=translate, scale=1.7))
        ref = _ref_world2view(R, t, translate, 1.7).T
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_projection_matches_reference(self):
        ours = np.array(perspective_projection(0.01, 100.0, 1.2, 0.9))
        ref = _ref_projection(0.01, 100.0, 1.2, 0.9).T
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_projection_maps_znear_zfar_to_0_1(self):
        znear, zfar = 0.01, 100.0
        P = np.array(perspective_projection(znear, zfar, 1.0, 1.0))
        for z, expect in [(znear, 0.0), (zfar, 1.0)]:
            p = np.array([0.0, 0.0, z, 1.0]) @ P
            assert abs(p[2] / p[3] - expect) < 1e-5

    def test_fov_focal_roundtrip(self):
        assert abs(focal2fov(fov2focal(1.1, 640), 640) - 1.1) < 1e-9

    def test_camera_center(self):
        rng = np.random.default_rng(2)
        R = _random_rotation(rng)
        t = rng.normal(size=3)
        cam = make_camera(R, t, 1.0, 0.8, 64, 48)
        # camera center = -R t in world space (w2c: x_cam = Rᵀ(x world) + t
        # with the reference's transposed-R storage convention)
        w2c = _ref_world2view(R, t)
        expect = np.linalg.inv(w2c)[:3, 3]
        np.testing.assert_allclose(np.array(cam.camera_center), expect, atol=1e-5)

    def test_full_proj_composition(self):
        rng = np.random.default_rng(3)
        R = _random_rotation(rng)
        t = rng.normal(size=3)
        cam = make_camera(R, t, 1.0, 0.8, 64, 48)
        p_world = rng.normal(size=3) + np.array([0, 0, 5.0])
        hom = np.append(p_world, 1.0)
        via_full = hom @ np.array(cam.full_proj)
        via_two = (hom @ _ref_world2view(R, t).T) @ _ref_projection(
            0.01, 100.0, 1.0, 0.8
        ).T
        np.testing.assert_allclose(via_full, via_two, rtol=1e-4, atol=1e-4)


class TestQuatCov:
    def test_quat_to_rotmat_orthonormal(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(10, 4))
        R = np.array(quat_to_rotmat(q))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(10), atol=1e-5)

    def test_identity_quat(self):
        R = np.array(quat_to_rotmat(jnp.array([1.0, 0, 0, 0])))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_covariance_psd_and_eigenvalues(self):
        rng = np.random.default_rng(5)
        s = np.abs(rng.normal(size=(8, 3))) + 0.1
        q = rng.normal(size=(8, 4))
        cov = np.array(build_covariance(jnp.array(s), jnp.array(q)))
        # eigenvalues of Σ must be s² (rotation-invariant)
        for i in range(8):
            ev = np.sort(np.linalg.eigvalsh(cov[i]))
            np.testing.assert_allclose(ev, np.sort(s[i] ** 2), rtol=1e-4)

    def test_symm6_layout(self):
        cov = np.arange(9, dtype=np.float32).reshape(3, 3)
        cov = cov + cov.T  # symmetrize
        sym = np.array(covariance_to_symm6(jnp.array(cov)))
        np.testing.assert_allclose(
            sym, [cov[0, 0], cov[0, 1], cov[0, 2], cov[1, 1], cov[1, 2], cov[2, 2]]
        )

    def test_scaling_modifier(self):
        s = jnp.array([[1.0, 2.0, 3.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        c1 = np.array(build_covariance(s, q, scaling_modifier=2.0))
        c2 = np.array(build_covariance(s * 2.0, q))
        np.testing.assert_allclose(c1, c2, rtol=1e-6)


class TestSH:
    def test_constants(self):
        assert abs(SH_C0 - 0.28209479177387814) < 1e-15

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([0.2, 0.5, 0.9])
        np.testing.assert_allclose(np.array(sh_to_rgb(rgb_to_sh(rgb))), np.array(rgb), atol=1e-6)

    def _ref_eval_sh(self, deg, sh, dirs):
        # independent numpy transcription of sh_utils.py:57-112
        C0, C1 = 0.28209479177387814, 0.4886025119029199
        C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
              -1.0925484305920792, 0.5462742152960396]
        C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
              0.3731763325901154, -0.4570457994644658, 1.445305721320277,
              -0.5900435899266435]
        result = C0 * sh[..., 0]
        if deg > 0:
            x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
            result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
            if deg > 1:
                xx, yy, zz = x * x, y * y, z * z
                xy, yz, xz = x * y, y * z, x * z
                result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                          + C2[2] * (2 * zz - xx - yy) * sh[..., 6]
                          + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
                if deg > 2:
                    result = (result
                              + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                              + C3[1] * xy * z * sh[..., 10]
                              + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                              + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                              + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                              + C3[5] * z * (xx - yy) * sh[..., 14]
                              + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
        return result

    @pytest.mark.parametrize("deg", [0, 1, 2, 3])
    def test_eval_sh_matches_reference(self, deg):
        rng = np.random.default_rng(6)
        n = 32
        sh = rng.normal(size=(n, 3, 16)).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ours = np.array(eval_sh(deg, jnp.array(sh), jnp.array(dirs)))
        ref = self._ref_eval_sh(deg, sh, dirs)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_deg0_is_dc_only(self):
        sh = jnp.ones((4, 3, 16))
        dirs = jnp.array([[0.0, 0.0, 1.0]] * 4)
        out = np.array(eval_sh(0, sh, dirs))
        np.testing.assert_allclose(out, SH_C0 * np.ones((4, 3)), atol=1e-6)


class TestSchedule:
    def _ref_expon(self, step, lr_init, lr_final, lr_delay_steps=0,
                   lr_delay_mult=1.0, max_steps=1000000):
        # numpy transcription of general_utils.py:47-60
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return delay_rate * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)

    def test_matches_reference(self):
        kw = dict(lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_mult=0.01,
                  lr_delay_steps=100, max_steps=30000)
        for step in [0, 1, 50, 100, 1000, 15000, 30000, 40000]:
            ours = float(exponential_lr(step, **kw))
            ref = self._ref_expon(step, **kw)
            assert abs(ours - ref) < 1e-9 + 1e-5 * abs(ref), step

    def test_endpoints(self):
        assert abs(float(exponential_lr(0, 1e-2, 1e-4, max_steps=100)) - 1e-2) < 1e-8
        assert abs(float(exponential_lr(100, 1e-2, 1e-4, max_steps=100)) - 1e-4) < 1e-9

    def test_negative_step_disabled(self):
        assert float(exponential_lr(-5, 1e-2, 1e-4)) == 0.0


class TestMisc:
    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        import jax

        np.testing.assert_allclose(
            np.array(jax.nn.sigmoid(inverse_sigmoid(x))), np.array(x), atol=1e-6
        )
