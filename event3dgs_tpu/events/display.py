"""Event stream visualization (offline).

Equivalent of the reference's cv2-window `EventDisplay`
(`Event_sensor/src/event_display.py:6-68`) for a headless environment:
accumulates events into refresh-rate frames (binary polarity or
exponentially-decayed time surface) and returns/saves them instead of
opening a window.
"""

from __future__ import annotations

import os

import numpy as np


class EventDisplay:
    """Accumulate an event stream into display frames every `frametime` µs."""

    def __init__(
        self,
        width: int,
        height: int,
        frametime: float = 33_000.0,
        mode: str = "binary",  # "binary" | "time_surface"
        tau: float = 30_000.0,
        out_dir: str | None = None,
    ):
        self.width = width
        self.height = height
        self.frametime = frametime
        self.mode = mode
        self.tau = tau
        self.out_dir = out_dir
        self.frames: list[np.ndarray] = []
        self._last_t = np.zeros((height, width), np.float64)
        self._last_p = np.zeros((height, width), np.int8)
        self._frame_events: list[tuple] = []
        self._next_refresh = frametime

    def update(self, t, x, y, p):
        """Feed a batch of events (time-ordered); emits frames as the clock
        crosses refresh boundaries."""
        t = np.asarray(t, np.float64)
        x = np.asarray(x, np.int64)
        y = np.asarray(y, np.int64)
        p = np.asarray(p, np.int64)
        start = 0
        while start < len(t):
            cut = np.searchsorted(t, self._next_refresh)
            seg = slice(start, cut)
            if cut > start:
                self._ingest(t[seg], x[seg], y[seg], p[seg])
            if cut < len(t):
                self._emit_frame()
                self._next_refresh += self.frametime
                start = cut
            else:
                break

    def _ingest(self, t, x, y, p):
        self._last_t[y, x] = t
        self._last_p[y, x] = np.where(p > 0, 1, -1)

    def _emit_frame(self):
        now = self._next_refresh
        if self.mode == "time_surface":
            decay = np.exp(-(now - self._last_t) / self.tau)
            decay[self._last_t == 0] = 0.0
            img = 0.5 + 0.5 * decay * self._last_p
        else:
            fresh = (now - self._last_t) < self.frametime
            img = np.full((self.height, self.width), 0.5)
            img[fresh & (self._last_p > 0)] = 1.0
            img[fresh & (self._last_p < 0)] = 0.0
        self.frames.append(img.astype(np.float32))
        if self.out_dir:
            from event3dgs_tpu.utils.image_io import save_image

            os.makedirs(self.out_dir, exist_ok=True)
            save_image(
                os.path.join(self.out_dir, f"disp_{len(self.frames):05d}.png"),
                img,
            )
