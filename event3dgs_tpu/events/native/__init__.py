"""Native DVS simulator: build-on-first-use C++ extension + numpy wrapper.

The reference ships a prebuilt `dsi` CPython extension; here the module is
compiled from `dvs_native.cpp` on first import (g++, cached next to the
source) and wrapped with a numpy-friendly API.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dvs_native.cpp")


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, "dvs_native" + suffix)


def build(force: bool = False) -> str:
    """Compile the extension if needed; returns the shared-object path."""
    so = _so_path()
    if not force and os.path.exists(so) and (
        os.path.getmtime(so) >= os.path.getmtime(_SRC)
    ):
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-std=c++17", "-fPIC",
        f"-I{include}", _SRC, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def load():
    """Import (building if necessary) the raw extension module."""
    so = build()
    spec = importlib.util.spec_from_file_location("dvs_native", so)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class NativeDvsSimulator:
    """numpy wrapper over the C++ module, API-compatible with
    :class:`event3dgs_tpu.events.dvs_model.DvsSimulator`."""

    def __init__(self, width: int, height: int, params=None, seed: int = 12345):
        from event3dgs_tpu.events.dvs_model import DvsParams

        self.width = width
        self.height = height
        self.params = params or DvsParams()
        self._m = load()
        self._m.initSimu(width, height, seed)
        p = self.params
        self._m.initLatency(p.latency, p.jitter, p.refractory, p.tau)
        self._m.initContrast(p.th_pos, p.th_neg, p.th_noise)

    def init_noise(self, hist_pos, hist_neg):
        hp = np.asarray(hist_pos, np.float64)
        self._m.initNoise(
            hp.reshape(-1).tolist(),
            np.asarray(hist_neg, np.float64).reshape(-1).tolist(),
            hp.shape[0],
        )

    def disable_noise(self):
        self._m.disableNoise()

    def init_image(self, img):
        self._m.initImg(np.asarray(img, np.float64).reshape(-1).tolist())

    def update(self, img, dt):
        from event3dgs_tpu.events.buffer import EventBuffer

        out = self._m.updateImg(
            np.asarray(img, np.float64).reshape(-1).tolist(), float(dt)
        )
        return EventBuffer.from_arrays(
            np.asarray(out["ts"], np.uint64),
            np.asarray(out["x"], np.uint16),
            np.asarray(out["y"], np.uint16),
            np.asarray(out["p"], np.uint8),
        )

    @property
    def voltages(self):
        return np.asarray(self._m.getCurv()).reshape(self.height, self.width)
