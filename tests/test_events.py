"""Tests for the event subsystem: buffer, codecs, DVS model, accumulation."""

import numpy as np
import pytest

from event3dgs_tpu.events import (
    DvsParams,
    DvsSimulator,
    EventBuffer,
    accumulation_frame,
    event_count_image,
    polarity_frame,
)
from event3dgs_tpu.events.accumulate import (
    color_polarity_frame,
    decode_event_frame,
)
from event3dgs_tpu.events.io import (
    load_dat_events,
    load_h5_events,
    window_events,
    write_dat_events,
)
from event3dgs_tpu.events.simulate import (
    generate_event_frames,
    rgb_to_luminance,
    simulate_event_camera,
)


class TestBuffer:
    def test_add_and_grow(self):
        buf = EventBuffer(2)
        for i in range(10):
            buf.add(i * 100, i, i + 1, i % 2)
        assert len(buf) == 10
        t, x, y, p = buf.arrays()
        assert t[5] == 500 and x[5] == 5 and y[5] == 6 and p[5] == 1

    def test_merge_sorts(self):
        a = EventBuffer.from_arrays([10, 30], [0, 0], [0, 0], [1, 1])
        b = EventBuffer.from_arrays([20, 40], [1, 1], [1, 1], [0, 0])
        a.merge(b)
        t, x, _, _ = a.arrays()
        np.testing.assert_array_equal(t, [10, 20, 30, 40])
        np.testing.assert_array_equal(x, [0, 1, 0, 1])


class TestIO:
    def test_dat_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 500
        t = np.sort(rng.integers(0, 1_000_000, n)).astype(np.uint64)
        x = rng.integers(0, 640, n).astype(np.uint16)
        y = rng.integers(0, 480, n).astype(np.uint16)
        p = rng.integers(0, 2, n).astype(np.uint8)
        path = str(tmp_path / "ev.dat")
        write_dat_events(path, t, x, y, p)
        t2, x2, y2, p2 = load_dat_events(path)
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(p2, p)

    def test_h5_roundtrip(self, tmp_path):
        buf = EventBuffer.from_arrays([1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 0, 1])
        path = str(tmp_path / "ev.h5")
        buf.write_h5(path)
        t, x, y, p = load_h5_events(path)
        np.testing.assert_array_equal(t, [1, 2, 3])
        np.testing.assert_array_equal(p, [1, 0, 1])

    def test_windowing(self):
        t = np.array([0, 100, 900, 1100, 1900, 2500], np.uint64)
        x = np.arange(6, dtype=np.uint16)
        y = np.zeros(6, np.uint16)
        p = np.ones(6, np.uint8)
        data = window_events(t, x, y, p, delta_t=1000)
        assert len(data.events) == 3
        assert len(data.events[0]) == 3  # t in [0, 1000)... 0,100,900
        assert data.events[1]["x"].tolist() == [3, 4]


class TestDvsModel:
    def _const(self, v, w=8, h=6):
        return np.full((h, w), float(v))

    def test_no_change_no_events(self):
        sim = DvsSimulator(8, 6, DvsParams(th_noise=0, jitter=0))
        sim.disable_noise()
        sim.init_image(self._const(128))
        buf = sim.update(self._const(128), 1000)
        assert len(buf) == 0

    def test_brightening_fires_positive(self):
        sim = DvsSimulator(8, 6, DvsParams(th_noise=0, jitter=0))
        sim.disable_noise()
        sim.init_image(self._const(64))
        buf = sim.update(self._const(200), 10_000)
        assert len(buf) > 0
        assert (np.asarray(buf.arrays()[3]) == 1).all()

    def test_darkening_fires_negative(self):
        sim = DvsSimulator(8, 6, DvsParams(th_noise=0, jitter=0))
        sim.disable_noise()
        sim.init_image(self._const(200))
        buf = sim.update(self._const(64), 10_000)
        assert len(buf) > 0
        assert (np.asarray(buf.arrays()[3]) == 0).all()

    def test_event_count_tracks_log_contrast(self):
        # the log-contrast/threshold ratio upper-bounds the count (the
        # refractory release can skip past several thresholds at once, as in
        # the C++ model), and more contrast must mean more events
        counts = {}
        for hi in (100, 200):
            sim = DvsSimulator(4, 4, DvsParams(th_noise=0, jitter=0))
            sim.disable_noise()
            sim.init_image(self._const(64, 4, 4))
            buf = sim.update(self._const(hi, 4, 4), 50_000)
            counts[hi] = len(buf) / 16
        upper = np.log(200 / 64) / 0.3
        assert 1 <= counts[200] <= upper + 0.5
        assert counts[200] > counts[100]

    def test_deterministic_repeatable(self):
        outs = []
        for _ in range(2):
            sim = DvsSimulator(6, 4, DvsParams(th_noise=0, jitter=0), seed=0)
            sim.disable_noise()
            sim.init_image(self._const(100, 6, 4))
            buf = sim.update(self._const(150, 6, 4), 5000)
            outs.append(buf.to_structured())
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_refractory_limits_rate(self):
        fast = DvsSimulator(4, 4, DvsParams(th_noise=0, jitter=0, refractory=10))
        slow = DvsSimulator(4, 4, DvsParams(th_noise=0, jitter=0, refractory=5000))
        for sim in (fast, slow):
            sim.disable_noise()
            sim.init_image(self._const(32, 4, 4))
        nf = len(fast.update(self._const(250, 4, 4), 8000))
        ns = len(slow.update(self._const(250, 4, 4), 8000))
        assert nf > ns

    def test_timestamps_within_frame_order(self):
        sim = DvsSimulator(8, 6, DvsParams(th_noise=0, jitter=0))
        sim.disable_noise()
        sim.init_image(self._const(64))
        buf = sim.update(self._const(200), 10_000)
        t = buf.arrays()[0]
        assert (np.diff(t.astype(np.int64)) >= 0).all()

    def test_noise_model_emits_background_events(self):
        sim = DvsSimulator(8, 6, DvsParams(th_noise=0, jitter=0), seed=1)
        # CDF step at the last bin → every pixel draws the fastest rate
        # (bins are ordered slowest→fastest, `simu.hpp:75-79`)
        hist = np.zeros((4, 72))
        hist[:, -1] = 1.0
        sim.init_noise(hist, hist)
        sim.init_image(self._const(128))
        buf = sim.update(self._const(128), 200_000)
        assert len(buf) > 0  # pure background noise, no signal


class TestAccumulate:
    def test_count_image(self):
        img = np.array(
            event_count_image([1, 1, 2], [0, 0, 1], [1, 0, 1], 4, 3)
        )
        assert img[0, 1] == 0.0  # +1 -1
        assert img[1, 2] == 1.0

    def test_accumulation_frame_range(self):
        img = np.array(accumulation_frame([0] * 100, [0] * 100, [1] * 100, 2, 2))
        assert img[0, 0] == 1.0  # saturates at white
        assert img[1, 1] == 0.5

    def test_polarity_frame(self):
        img = np.array(polarity_frame([0, 1], [0, 0], [1, 0], 3, 2))
        assert img[0, 0] == 1.0 and img[0, 1] == 0.0 and img[1, 2] == 0.5

    def test_color_roundtrip(self):
        x, y, p = [0, 0, 1], [0, 0, 0], [1, 1, 0]
        img = color_polarity_frame(x, y, p, 3, 2)
        dec = np.array(decode_event_frame(img))
        assert dec[0, 0] == pytest.approx(2.0, abs=1e-5)
        assert dec[0, 1] == pytest.approx(-1.0, abs=1e-5)


class TestSimulate:
    def test_end_to_end_synthesis(self, tmp_path):
        rng = np.random.default_rng(0)
        base = rng.uniform(0.2, 0.8, (12, 16, 3))
        frames = [base * (1.0 + 0.15 * i) for i in range(5)]
        buf = simulate_event_camera(
            frames, dt=1000, params=DvsParams(th_noise=0, jitter=0, th_pos=0.1,
                                              th_neg=0.1),
        )
        assert len(buf) > 0
        path = str(tmp_path / "out")
        from event3dgs_tpu.events.simulate import save_event_result

        dat = save_event_result(buf, path, width=16, height=12)
        t, x, y, p = load_dat_events(dat)
        assert len(t) == len(buf)
        imgs = generate_event_frames(buf, 16, 12, 1000, out_dir=path)
        assert len(imgs) >= 1
        assert imgs[0].shape == (12, 16)

    def test_luminance_positive(self):
        img = np.zeros((4, 4, 3))
        assert (rgb_to_luminance(img) > 0).all()

    @pytest.mark.parametrize(
        "layout,subpath,first_name",
        [
            ("default", "out", "00002.png"),
            ("volt", "out_ac", "00003.png"),
            ("edslike", "out/images_simu", "frame_0000000000.png"),
            ("eds", "out/images_ac", "frame_0000000000.png"),
            ("T", "out/images_ac", "0000.png.png"),
            ("tumvie", "out/images_ac", "00000..png"),
        ],
    )
    def test_accumulation_layouts(self, tmp_path, layout, subpath, first_name):
        """The five dataset-specific accumulation layouts of the reference
        (`Event_sensor/event_tools.py:84-160`): window fraction, output
        directory, and filename pattern (index offsets + double-extension
        quirks preserved)."""
        from event3dgs_tpu.events.simulate import ACCUMULATION_LAYOUTS

        buf = EventBuffer(16)
        # 8 events spread over 4 ms: two per 1000-us interval, the second of
        # each pair in the trailing 90% (dropped by frac=0.1 layouts)
        for i in range(4):
            buf.add(i * 1000 + 10, 1 + i, 2, 1)
            buf.add(i * 1000 + 500, 5, 3 + i, 0)
        out = str(tmp_path / "out")
        imgs = generate_event_frames(
            buf, 16, 12, 1000, out_dir=out, layout=layout, total_frames=3
        )
        assert len(imgs) == 3
        assert imgs[0].shape == (12, 16)
        dest = tmp_path / subpath
        assert (dest / first_name).exists(), sorted(
            p.name for p in dest.iterdir()
        )
        frac = ACCUMULATION_LAYOUTS[layout]["window_frac"]
        mid = 0.5
        if frac < 1.0:
            # trailing-window event (t=510) must be excluded from frame 0
            assert imgs[0][3, 5] == pytest.approx(mid)
            assert imgs[0][2, 1] != pytest.approx(mid)
        else:
            assert imgs[0][3, 5] != pytest.approx(mid)
            assert imgs[0][2, 1] != pytest.approx(mid)
