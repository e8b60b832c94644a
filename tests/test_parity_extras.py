"""Tests for parity-completeness additions: experimental event losses,
event-IO format readers, slerp interpolation, COLMAP model writers, LPIPS
backbones, and the generate_dataset CLI."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from event3dgs_tpu.losses import (
    chamfer_event_loss,
    cross_entropy_event_loss,
    l1_loss,
    pointcloud_nn_loss,
    quadratic_tolerance_loss,
)


class TestExperimentalEventLosses:
    def _frames(self, seed=0, h=20, w=25):
        rng = np.random.default_rng(seed)
        d = jnp.asarray(rng.normal(0, 1, (h, w, 1)), jnp.float32)
        g = jnp.asarray(rng.normal(0, 1, (h, w, 1)), jnp.float32)
        return d, g

    def test_cross_entropy_identical_frames(self):
        d, _ = self._frames()
        # identical inputs: both rows are the same softmax distribution, the
        # loss reduces to (nll(p0)+nll(p1))/2/10 — finite, non-negative
        v = float(cross_entropy_event_loss(d, d))
        assert np.isfinite(v) and v > 0

    def test_cross_entropy_matches_manual(self):
        d, g = self._frames(1)
        rows = np.stack([
            np.abs(d[..., 0]).ravel() / np.abs(d).max(),
            np.abs(g[..., 0]).ravel() / np.abs(g).max(),
        ])
        lse = np.log(np.exp(rows).sum(1))
        expected = ((lse[0] - rows[0, 0]) + (lse[1] - rows[1, 1])) / 2 / 10
        got = float(cross_entropy_event_loss(d, g))
        assert np.isclose(got, expected, rtol=1e-4), (got, expected)

    def test_quadratic_tolerance_zero_inside_band(self):
        d = jnp.full((8, 8, 1), 0.5)
        g = d + 0.1
        assert float(quadratic_tolerance_loss(d, g, tolerance=0.2)) == 0.0
        v = float(quadratic_tolerance_loss(d, g + 0.2, tolerance=0.2))
        # |diff|=0.3 → ((0.3-0.2)*1000)² = 1e4
        assert np.isclose(v, 1e4, rtol=1e-3)

    def test_pointcloud_nn_perfect_match_is_zero(self):
        g = np.zeros((16, 16, 1), np.float32)
        g[3, 4] = 1.0
        g[10, 12] = -1.0
        v = float(pointcloud_nn_loss(jnp.asarray(g), jnp.asarray(g)))
        assert v == 0.0

    def test_pointcloud_nn_distance(self):
        g = np.zeros((16, 16, 1), np.float32)
        out = np.zeros((16, 16, 1), np.float32)
        g[3, 4] = 1.0
        out[3, 7] = 1.0  # 3 px away
        g[10, 12] = -1.0
        out[14, 12] = -1.0  # 4 px away
        v = float(pointcloud_nn_loss(jnp.asarray(out), jnp.asarray(g)))
        assert np.isclose(v, 7.0, atol=1e-4)

    def test_pointcloud_nn_fallback_to_l1(self):
        out = jnp.full((8, 8, 1), 0.2)
        g = jnp.full((8, 8, 1), 0.4)
        v = float(pointcloud_nn_loss(out, g))
        assert np.isclose(v, float(l1_loss(out, g)), atol=1e-6)

    def test_chamfer_zero_for_identical(self):
        rng = np.random.default_rng(3)
        d = jnp.asarray(
            np.sign(rng.normal(size=(20, 20, 1)))
            * rng.uniform(0.9, 2.0, (20, 20, 1)),
            jnp.float32,
        )
        # matched points at distance 0 → |gt−match−band| = band → relu(0)=0
        assert float(chamfer_event_loss(d, d)) == 0.0

    def test_chamfer_penalizes_mismatch(self):
        d = np.zeros((20, 20, 1), np.float32)
        g = np.zeros((20, 20, 1), np.float32)
        g[::2, ::2] = 5.0   # strong positive events everywhere on grid
        d[1::2, 1::2] = 1.0  # weak, offset
        v = float(chamfer_event_loss(jnp.asarray(d), jnp.asarray(g)))
        assert np.isfinite(v) and v > 0


class TestEventIOFormats:
    def test_text_roundtrip_v2e_and_volt(self, tmp_path):
        from event3dgs_tpu.events.io import (
            load_text_events,
            read_v2e_windowed,
            read_volt_windowed,
        )

        path = tmp_path / "ev.txt"
        with open(path, "w") as f:
            f.write("# header comment\n(width 10 height 8)\n")
            for i in range(20):
                f.write(f"{i * 0.001:.6f} {i % 10} {i % 8} {i % 2}\n")
        t, x, y, p = load_text_events(str(path), time_scale=1e6)
        assert t[1] - t[0] == 1000
        assert x.dtype == np.uint16 and p.dtype == np.uint8
        data = read_v2e_windowed(str(path), delta_t=5000)
        assert len(data.events) >= 3
        assert data.width == 10 and data.height == 8

        # volt: µs timestamps, integer-valued
        path2 = tmp_path / "volt.txt"
        with open(path2, "w") as f:
            for i in range(10):
                f.write(f"{i * 100} {i % 5} {i % 4} {i % 2}\n")
        data2 = read_volt_windowed(str(path2), delta_t=300)
        assert data2.global_max_t == 900

    def test_h5_windowed(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from event3dgs_tpu.events.io import read_h5_windowed

        path = tmp_path / "ev.h5"
        with h5py.File(path, "w") as f:
            g = f.create_group("events")
            g["t"] = np.arange(100, dtype=np.int64) * 50
            g["x"] = np.arange(100, dtype=np.uint16) % 12
            g["y"] = np.arange(100, dtype=np.uint16) % 9
            g["p"] = (np.arange(100) % 2).astype(np.uint8)
        data = read_h5_windowed(str(path), delta_t=1000)
        assert data.width == 12 and data.height == 9
        assert sum(len(w) for w in data.events) <= 100

    def test_reader_registry_complete(self):
        from event3dgs_tpu.events.io import WINDOWED_READERS

        for fmt in ("dat", "h5", "eds", "tumvie", "v2e", "volt", "csv",
                    "iebcs"):
            assert fmt in WINDOWED_READERS


class TestSlerp:
    def test_slerp_endpoints_and_midpoint(self):
        from scipy.spatial.transform import Rotation

        from event3dgs_tpu.tools.render_products import slerp_pose

        R0 = Rotation.from_euler("y", 10, degrees=True).as_matrix()
        R1 = Rotation.from_euler("y", 50, degrees=True).as_matrix()
        t0, t1 = np.array([0.0, 0, 0]), np.array([1.0, 2, 3])
        Ra, ta = slerp_pose(R0, t0, R1, t1, 0.0)
        np.testing.assert_allclose(Ra, R0, atol=1e-6)
        np.testing.assert_allclose(ta, t0, atol=1e-6)
        Rm, tm = slerp_pose(R0, t0, R1, t1, 0.5)
        Rexp = Rotation.from_euler("y", 30, degrees=True).as_matrix()
        np.testing.assert_allclose(Rm, Rexp, atol=1e-5)
        np.testing.assert_allclose(tm, 0.5 * t1, atol=1e-6)

    def test_slerp_handles_near_parallel(self):
        from event3dgs_tpu.tools.render_products import slerp_pose

        R = np.eye(3)
        Rm, _ = slerp_pose(R, np.zeros(3), R, np.ones(3), 0.3)
        np.testing.assert_allclose(Rm, R, atol=1e-6)


class TestColmapModelWriters:
    def _model(self):
        from event3dgs_tpu.data.colmap import ColmapCamera, ColmapImage

        cams = {
            1: ColmapCamera(1, "PINHOLE", 640, 480,
                            np.array([500.0, 500.0, 320.0, 240.0]))
        }
        q = np.array([1.0, 0.0, 0.0, 0.0])
        images = {
            1: ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png"),
            2: ColmapImage(2, q, np.array([0.4, 0.5, 0.6]), 1, "b.png"),
        }
        xyz = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        rgb = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        return cams, images, (xyz, rgb)

    @pytest.mark.parametrize("ext", [".bin", ".txt"])
    def test_write_read_roundtrip(self, tmp_path, ext):
        from event3dgs_tpu.data.colmap import read_model, write_model

        cams, images, points = self._model()
        out = str(tmp_path / "sparse")
        write_model(cams, images, points, out, ext=ext)
        rcams, rimages, rpoints = read_model(out)
        assert rcams[1].model == "PINHOLE"
        np.testing.assert_allclose(rcams[1].params, cams[1].params)
        assert rimages[2].name == "b.png"
        np.testing.assert_allclose(rimages[1].tvec, images[1].tvec)
        np.testing.assert_allclose(rpoints[0], points[0])
        np.testing.assert_array_equal(rpoints[1], points[1])


class TestLpipsBackbones:
    def _rand_params_vgg(self, rng):
        from event3dgs_tpu.losses.lpips import _VGG_CFG, _VGG_TAPS

        params, cin, ci = {}, 3, 0
        taps = []
        for item in _VGG_CFG:
            if item == "M":
                continue
            params[f"conv{ci}_w"] = jnp.asarray(
                rng.normal(0, 0.05, (3, 3, cin, item)), jnp.float32)
            params[f"conv{ci}_b"] = jnp.zeros(item)
            if ci in _VGG_TAPS:
                taps.append(item)
            cin = item
            ci += 1
        for i, c in enumerate(taps):
            params[f"lin{i}_w"] = jnp.asarray(
                np.abs(rng.normal(0, 1, c)), jnp.float32)
        return params

    def test_vgg_backbone_stages_and_metric(self):
        from event3dgs_tpu.losses.lpips import lpips_distance, vgg16_features

        rng = np.random.default_rng(0)
        params = self._rand_params_vgg(rng)
        img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
        feats = vgg16_features(params, img[None])
        assert len(feats) == 5
        assert feats[0].shape[-1] == 64 and feats[-1].shape[-1] == 512
        d_same = float(lpips_distance(params, img, img, net="vgg"))
        assert np.isclose(d_same, 0.0, atol=1e-5)
        img2 = jnp.clip(img + 0.3, 0, 1)
        assert float(lpips_distance(params, img, img2, net="vgg")) > d_same

    def test_squeeze_backbone_stages(self):
        from event3dgs_tpu.losses.lpips import squeezenet_features

        rng = np.random.default_rng(1)
        params = {"conv0_w": jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 64)),
                                         jnp.float32),
                  "conv0_b": jnp.zeros(64)}
        fire_cfg = [  # (in, squeeze, expand) per fire module, SqueezeNet 1.1
            (64, 16, 64), (128, 16, 64), (128, 32, 128), (256, 32, 128),
            (256, 48, 192), (384, 48, 192), (384, 64, 256), (512, 64, 256),
        ]
        for i, (cin, cs, ce) in enumerate(fire_cfg):
            name = f"fire{i + 1}"
            params[f"{name}_s_w"] = jnp.asarray(
                rng.normal(0, 0.1, (1, 1, cin, cs)), jnp.float32)
            params[f"{name}_s_b"] = jnp.zeros(cs)
            params[f"{name}_e1_w"] = jnp.asarray(
                rng.normal(0, 0.1, (1, 1, cs, ce)), jnp.float32)
            params[f"{name}_e1_b"] = jnp.zeros(ce)
            params[f"{name}_e3_w"] = jnp.asarray(
                rng.normal(0, 0.1, (3, 3, cs, ce)), jnp.float32)
            params[f"{name}_e3_b"] = jnp.zeros(ce)
        img = jnp.asarray(rng.uniform(0, 1, (1, 65, 65, 3)), jnp.float32)
        feats = squeezenet_features(params, img)
        assert len(feats) == 7
        assert feats[0].shape[-1] == 64
        assert feats[-1].shape[-1] == 512


class TestGenerateDatasetCli:
    def test_stream_to_frames(self, tmp_path):
        from event3dgs_tpu.cli.generate_dataset import main
        from event3dgs_tpu.events.io import write_dat_events

        rng = np.random.default_rng(0)
        n = 500
        t = np.sort(rng.integers(0, 10_000, n)).astype(np.uint64)
        x = rng.integers(0, 32, n).astype(np.uint16)
        y = rng.integers(0, 24, n).astype(np.uint16)
        p = rng.integers(0, 2, n).astype(np.uint8)
        dat = tmp_path / "raw.dat"
        write_dat_events(str(dat), t, x, y, p, width=32, height=24)
        out = tmp_path / "frames"
        rc = main(["--events", str(dat), "--format", "dat",
                   "--delta_t", "2000", "-o", str(out)])
        assert rc == 0
        pngs = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(pngs) >= 4
