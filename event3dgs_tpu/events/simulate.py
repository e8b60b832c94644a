"""High-level event synthesis: frame sequences → event streams → datasets.

Equivalent of the reference's `Event_sensor/event_tools.py:33-160`: feed a
rendered image sequence through the DVS simulator, save the stream as
`.dat`, and regenerate per-window event frames for the `images_event/`
training folder.
"""

from __future__ import annotations

import os

import numpy as np

from event3dgs_tpu.events.accumulate import (
    accumulation_frame,
    color_polarity_frame,
)
from event3dgs_tpu.events.buffer import EventBuffer
from event3dgs_tpu.events.dvs_model import DvsParams, DvsSimulator
from event3dgs_tpu.events.io import window_events


def rgb_to_luminance(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float [0,1] → L-channel-style luminance in (0, 255].

    The reference converts frames to LUV and feeds the L channel
    (`event_tools.py:44-50`); we use the same CIE-X-weighted combination as
    the training loss (`loss_utils.py:24-28`) scaled to [0, 255].
    """
    lum = (
        0.4124 * img[..., 0] + 0.35758 * img[..., 1] + 0.1804 * img[..., 2]
    ) * 255.0
    return np.maximum(lum, 1e-3)  # log() needs positive input


def simulate_event_camera(
    frames,
    dt: float = 1000.0,
    params: DvsParams | None = None,
    seed: int = 0,
    noise_hist: tuple | None = None,
) -> EventBuffer:
    """Frame sequence → merged event stream (`simulate_event_camera`,
    `event_tools.py:33-59`).

    Args:
        frames: iterable of [H, W, 3] float images in [0, 1].
        dt: inter-frame interval in µs.
        params: sensor parameters (defaults = reference pipeline values).
        noise_hist: optional (hist_pos, hist_neg) CDF arrays enabling the
            measured background-noise model.
    """
    frames = list(frames)
    if not frames:
        return EventBuffer(1)
    h, w = frames[0].shape[:2]
    sim = DvsSimulator(w, h, params=params, seed=seed)
    if noise_hist is not None:
        sim.init_noise(*noise_hist)
    else:
        sim.disable_noise()
    sim.init_image(rgb_to_luminance(np.asarray(frames[0])))
    full = EventBuffer(4096)
    for frame in frames[1:]:
        buf = sim.update(rgb_to_luminance(np.asarray(frame)), dt)
        full.add_array(*buf.arrays())
    full.sort()
    return full


def save_event_result(buf: EventBuffer, out_dir: str, width=0, height=0) -> str:
    """Write `raw.dat` (`save_event_result`, `event_tools.py:61-64`)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "raw.dat")
    buf.write_dat(path, width=width, height=height)
    return path


def generate_event_frames(
    buf: EventBuffer,
    width: int,
    height: int,
    delta_t: int,
    out_dir: str | None = None,
    style: str = "accumulate",
):
    """Window the stream and build frames (`generate_images*`,
    `event_tools.py:66-160`).

    Args:
        style: "accumulate" (±10/255 around mid-gray) or "color"
            (positive→R / negative→B, decodable by `decode_event_frame`).

    Returns:
        list of [H, W] or [H, W, 3] numpy frames (also saved as PNGs when
        ``out_dir`` is given).
    """
    data = window_events(*buf.arrays(), delta_t)
    frames = []
    for i, w in enumerate(data.events):
        if style == "color":
            img = color_polarity_frame(w["x"], w["y"], w["p"], width, height)
        else:
            img = accumulation_frame(w["x"], w["y"], w["p"], width, height)
        img = np.asarray(img)
        frames.append(img)
        if out_dir:
            from event3dgs_tpu.utils.image_io import save_image

            os.makedirs(out_dir, exist_ok=True)
            save_image(os.path.join(out_dir, f"events_{i:05d}.png"), img)
    return frames
