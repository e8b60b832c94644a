"""Tests for native DVS module, event metrics, arbiters, ESIM."""

import shutil

import numpy as np
import pytest

from event3dgs_tpu.events.arbiter import (
    BottleneckArbiter,
    RowArbiter,
    SynchronousArbiter,
)
from event3dgs_tpu.events.buffer import EventBuffer
from event3dgs_tpu.events.dvs_model import DvsParams, DvsSimulator
from event3dgs_tpu.events.esim import EsimSimulator
from event3dgs_tpu.events.metrics import (
    chamfer_distance,
    gaussian_distance,
    spike_cube_distance,
)

HAS_GXX = shutil.which("g++") is not None


@pytest.mark.skipif(not HAS_GXX, reason="no g++ toolchain")
class TestNativeDvs:
    def test_native_matches_python_deterministic(self):
        from event3dgs_tpu.events.native import NativeDvsSimulator

        p = DvsParams(th_noise=0, jitter=0)
        w, h = 12, 9
        rng = np.random.default_rng(1)
        frames = [rng.uniform(40, 220, (h, w))]
        for _ in range(3):
            frames.append(frames[-1] * rng.uniform(0.7, 1.4, (h, w)))

        nat = NativeDvsSimulator(w, h, p)
        nat.disable_noise()
        nat.init_image(frames[0])
        py = DvsSimulator(w, h, p)
        py.disable_noise()
        py.init_image(frames[0])

        for f in frames[1:]:
            sn = nat.update(f, 1500).to_structured()
            sp = py.update(f, 1500).to_structured()
            assert len(sn) == len(sp)
            key = ["t", "x", "y", "p"]
            np.testing.assert_array_equal(
                np.sort(sn, order=key), np.sort(sp, order=key)
            )

    def test_native_noise_runs(self):
        from event3dgs_tpu.events.native import NativeDvsSimulator

        sim = NativeDvsSimulator(8, 6, DvsParams())
        hist = np.zeros((4, 72))
        hist[:, -1] = 1.0
        sim.init_noise(hist, hist)
        sim.init_image(np.full((6, 8), 128.0))
        buf = sim.update(np.full((6, 8), 128.0), 100_000)
        assert len(buf) > 0

    def test_voltages_follow_log_intensity(self):
        from event3dgs_tpu.events.native import NativeDvsSimulator

        sim = NativeDvsSimulator(4, 4, DvsParams(th_noise=0, jitter=0))
        sim.disable_noise()
        sim.init_image(np.full((4, 4), 100.0))
        sim.update(np.full((4, 4), 100.0), 100_000)
        np.testing.assert_allclose(sim.voltages, np.log(100.0), atol=1e-6)


def _stream(seed, n=200, w=32, h=24, span=50_000):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.integers(0, span, n)).astype(np.uint64)
    return (
        t,
        rng.integers(0, w, n).astype(np.uint16),
        rng.integers(0, h, n).astype(np.uint16),
        rng.integers(0, 2, n).astype(np.uint8),
    )


class TestMetrics:
    def test_chamfer_identity_zero(self):
        a = _stream(0)
        assert chamfer_distance(a, a, 32, 24) == pytest.approx(0.0, abs=1e-12)

    def test_chamfer_symmetry_and_separation(self):
        a, b = _stream(0), _stream(1)
        d_ab = chamfer_distance(a, b, 32, 24)
        d_ba = chamfer_distance(b, a, 32, 24)
        assert d_ab == pytest.approx(d_ba, rel=1e-9)
        assert d_ab > 0

    def test_gaussian_distance_bounded(self):
        a, b = _stream(0), _stream(1)
        d = gaussian_distance(a, b, 32, 24)
        assert 0 < d < 2.0

    def test_spike_cube_identity_zero(self):
        a = _stream(2)
        assert spike_cube_distance(a, a, 32, 24) == pytest.approx(0.0, abs=1e-6)

    def test_spike_cube_separates(self):
        a, b = _stream(2), _stream(3)
        assert spike_cube_distance(a, b, 32, 24) > 0


class TestArbiters:
    def _buf(self):
        # burst of simultaneous events
        return EventBuffer.from_arrays(
            [100] * 5 + [200], [0, 1, 2, 3, 4, 0], [0, 1, 0, 1, 2, 0],
            [1] * 6,
        )

    def test_bottleneck_serializes(self):
        out = BottleneckArbiter(dt_per_event=10).process(self._buf())
        t = out.arrays()[0].astype(np.int64)
        assert (np.diff(t) >= 10).all() or len(t) <= 1

    def test_row_arbiter_row_grouping(self):
        out = RowArbiter(cycle=5, height=4).process(self._buf())
        assert len(out) == 6
        t, x, y, p = out.arrays()
        # events of the same row released at the same cycle
        for row in np.unique(y):
            row_t = t[y == row]
            assert len(np.unique(row_t)) <= 2

    def test_synchronous_scan(self):
        out = SynchronousArbiter(row_time=10, height=4).process(self._buf())
        t, x, y, p = out.arrays()
        # release times are aligned to the row phase of the scan
        assert ((t.astype(np.int64) - y.astype(np.int64) * 10) % 40 == 0).all()


class TestEsim:
    def test_crossing_counts(self):
        sim = EsimSimulator(6, 4, th_pos=0.2, th_neg=0.2)
        sim.init_image(np.full((4, 6), 50.0))
        buf = sim.update(np.full((4, 6), 150.0), 1000)
        per_px = len(buf) / 24
        expect = np.floor(np.log(150.0 / 50.0) / 0.2)
        assert per_px == pytest.approx(expect)
        assert (buf.arrays()[3] == 1).all()

    def test_interpolated_timestamps(self):
        sim = EsimSimulator(2, 2, th_pos=0.5, th_neg=0.5)
        sim.init_image(np.full((2, 2), 10.0))
        buf = sim.update(np.full((2, 2), 100.0), 1000)
        t = buf.arrays()[0]
        assert t.min() >= 0 and t.max() <= 1000
        assert len(np.unique(t)) > 1  # crossings spread over the interval


class TestIOTail:
    """IEBCS decode, start/stop windows, Metavision stub, viz functions
    (VERDICT r2 item 9)."""

    def _write_stream(self, tmp_path):
        from event3dgs_tpu.events.io import write_dat_events

        t = np.arange(0, 1000, 10, dtype=np.uint64) + 5
        x = (np.arange(len(t)) % 7).astype(np.uint16)
        y = (np.arange(len(t)) % 5).astype(np.uint16)
        p = (np.arange(len(t)) % 2).astype(np.uint8)
        path = str(tmp_path / "ev.dat")
        write_dat_events(path, t, x, y, p)
        return path, t, x, y, p

    def test_load_dat_start_stop(self, tmp_path):
        from event3dgs_tpu.events.io import load_dat_events

        path, t, x, y, p = self._write_stream(tmp_path)
        t2, x2, y2, p2 = load_dat_events(path, start=105, stop=505)
        keep = (t >= 105) & (t < 505)
        np.testing.assert_array_equal(t2, t[keep])
        np.testing.assert_array_equal(x2, x[keep])

    def test_iebcs_windowing_matches_reference_semantics(self, tmp_path):
        from event3dgs_tpu.events.io import read_iebcs_windowed

        path, t, x, y, p = self._write_stream(tmp_path)
        # duration = 990, delta_t 300 -> 3 full buckets + remainder
        ed = read_iebcs_windowed(path, 300)
        assert len(ed.events) == 4
        # buckets anchored at t[0]=5; side="right" makes full buckets
        # inclusive of their right edge (reference searchsorted semantics)
        starts = [int(w["t"][0]) for w in ed.events if w.size]
        assert starts[0] == 5
        total = sum(w.size for w in ed.events)
        # boundary events t = 305/605/905 land in BOTH their bucket and the
        # next — faithful to the reference's searchsorted semantics
        # (side="right" bucket ends overlap the next side="left" start,
        # `event_file_io.py:272-273`)
        assert total == len(t) + 3
        assert ed.global_min_t == 0
        assert ed.global_max_t == int(t[-1] - t[0])

    def test_metavision_stub_raises_with_guidance(self):
        from event3dgs_tpu.events.io import read_metavision_live

        with pytest.raises(ImportError, match="Metavision SDK"):
            read_metavision_live("/nonexistent.raw", 1000)

    def test_registry_routes_iebcs_distinctly(self):
        from event3dgs_tpu.events.io import (
            WINDOWED_READERS, read_dat_windowed, read_iebcs_windowed,
        )

        assert WINDOWED_READERS["iebcs"] is read_iebcs_windowed
        assert WINDOWED_READERS["dat"] is read_dat_windowed
        assert "raw" in WINDOWED_READERS


class TestEventViz:
    def _events(self):
        from event3dgs_tpu.events.io import WINDOW_DTYPE

        ev = np.zeros(6, WINDOW_DTYPE)
        ev["x"] = [1, 1, 2, 3, 3, 3]
        ev["y"] = [0, 0, 1, 2, 2, 2]
        ev["p"] = [1, 1, 0, 1, 0, 0]
        ev["t"] = [10, 20, 30, 40, 50, 1000]
        return ev

    def test_display_events_frame_counts(self):
        from event3dgs_tpu.events.display import display_events_frame

        img = display_events_frame(self._events(), 0, 100, width=8, height=4)
        assert img.shape == (4, 8, 3)
        assert img[0, 1, 2] == 20   # two ON events at (1,0) -> red 2*10
        assert img[1, 2, 0] == 10   # one OFF at (2,1) -> blue
        assert img[2, 3, 2] == 10 and img[2, 3, 0] == 10
        # t=1000 event excluded by the window
        assert img.sum() == 20 + 10 + 10 + 10

    def test_event_cloud_3d_colors(self):
        from event3dgs_tpu.events.display import event_cloud_3d

        out = event_cloud_3d(self._events(), 0, 100)
        positions, colors = out  # open3d absent in this env
        assert positions.shape == (5, 3)
        on_color = np.asarray([30, 30, 220]) / 255.0
        np.testing.assert_allclose(colors[0], on_color)

    def test_video_roundtrip(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from event3dgs_tpu.events.display import (
            generate_comparison_video, generate_event_video,
        )

        ev = self._events()
        v1 = generate_event_video(
            ev, 0, 60, dt=30, video_name=str(tmp_path / "a.avi"),
            width=64, height=32,
        )
        v2 = generate_event_video(
            ev, 0, 60, dt=30, video_name=str(tmp_path / "b.avi"),
            width=64, height=32,
        )
        cap = cv2.VideoCapture(v1)
        assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()
        grid = generate_comparison_video(
            {"ours": v1, "reference": v2}, str(tmp_path / "grid.avi"),
            tile=(64, 32),
        )
        cap = cv2.VideoCapture(grid)
        ok, frame = cap.read()
        assert ok and frame.shape == (32, 128, 3)
        cap.release()


class TestExampleDrivers:
    """The parameterized example drivers (reference example_*.py ports)."""

    def test_images_to_events_pipeline(self, tmp_path):
        from event3dgs_tpu.examples.images_to_events import main as i2e
        from event3dgs_tpu.utils.image_io import save_image

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        base = rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)
        for i in range(4):
            save_image(str(img_dir / f"f_{i:03d}.png"),
                       np.clip(base + 0.08 * i, 0, 1))
        out = tmp_path / "out"
        assert i2e(["--images", str(img_dir), "-o", str(out),
                    "--dt", "500", "--th_noise", "0"]) == 0
        assert (out / "raw.dat").exists()
        assert len(list((out / "frames").glob("*.png"))) >= 1

    def test_noise_calibration_synthesize_and_average(self, tmp_path):
        from event3dgs_tpu.examples.noise_calibration import (
            CANDIDATE_RATES, main as nc,
        )

        a, b = tmp_path / "a.npy", tmp_path / "b.npy"
        out = tmp_path / "avg.npy"
        assert nc(["--synthesize", "0.5", "-o", str(a)]) == 0
        assert nc(["--synthesize", "2.0", "-o", str(b)]) == 0
        assert nc(["--inputs", str(a), str(b), "-o", str(out)]) == 0
        avg = np.load(out)
        assert avg.shape == (1, CANDIDATE_RATES.size)
        assert avg.max() == 1.0 and 0.5 in avg  # step CDFs averaged

    def test_compare_streams_self_zero(self, tmp_path):
        import json

        from event3dgs_tpu.events.io import write_dat_events
        from event3dgs_tpu.examples.compare_streams import main as cmp

        rng = np.random.default_rng(1)
        n = 400
        t = np.sort(rng.integers(0, 50_000, n)).astype(np.uint64)
        x = rng.integers(0, 32, n).astype(np.uint16)
        y = rng.integers(0, 24, n).astype(np.uint16)
        p = rng.integers(0, 2, n).astype(np.uint8)
        dat = tmp_path / "s.dat"
        write_dat_events(str(dat), t, x, y, p)
        out = tmp_path / "cmp"
        assert cmp(["--real", str(dat), "--sim", str(dat),
                    "--sim_format", "dat", "-o", str(out),
                    "--delta_t", "60000"]) == 0
        rep = json.loads((out / "comparison.json").read_text())
        assert rep["chamfer"] == 0.0
        # shifting the stream must strictly grow the distance
        biases = [r[1] for r in rep["bias_sweep"]]
        assert biases[0] == 0.0 and biases[-1] > biases[1] > 0.0


def test_default_noise_hists_drive_simulator():
    from event3dgs_tpu.events.dvs_model import DvsSimulator, default_noise_hists

    pos, neg = default_noise_hists("low_light")
    assert pos.shape == (256, 72) and neg.shape == (256, 72)
    assert np.all(np.diff(pos, axis=1) >= -1e-6)  # valid CDFs
    sim = DvsSimulator(8, 8, seed=0)
    sim.init_noise(pos, neg)
    assert np.isfinite(sim.bgn_pos_next).any()  # noise schedule armed
