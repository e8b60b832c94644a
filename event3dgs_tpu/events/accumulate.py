"""Event-frame accumulation: event streams → images (jnp scatter_add).

Equivalents of the reference's frame builders (`event_tools.py:66-160`,
`event_file_io.py:438-573`): per-window polarity frames, ±10/255-per-event
accumulation frames around mid-gray, signed count images, and the R/B color
encoding whose decode is `Normalize_event_frame` (`loss_utils.py:252-268`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ACCUM_STEP = 10.0 / 255.0  # per-event brightness step (`display_events_accumu`)


def event_count_image(x, y, p, width: int, height: int) -> jnp.ndarray:
    """Signed per-pixel event counts: [H, W], +1 per positive event."""
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    sign = jnp.where(jnp.asarray(p) > 0, 1.0, -1.0)
    flat = jnp.zeros(height * width, jnp.float32)
    flat = flat.at[y * width + x].add(sign, mode="drop")
    return flat.reshape(height, width)


def accumulation_frame(x, y, p, width: int, height: int) -> jnp.ndarray:
    """Mid-gray frame with ±ACCUM_STEP per event, clipped to [0, 1]."""
    counts = event_count_image(x, y, p, width, height)
    return jnp.clip(0.5 + counts * ACCUM_STEP, 0.0, 1.0)


def polarity_frame(x, y, p, width: int, height: int) -> jnp.ndarray:
    """Last-polarity-wins display frame: gray bg, white pos, black neg."""
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    val = jnp.where(jnp.asarray(p) > 0, 1.0, 0.0)
    flat = jnp.full(height * width, 0.5, jnp.float32)
    flat = flat.at[y * width + x].set(val, mode="drop")
    return flat.reshape(height, width)


def color_polarity_frame(x, y, p, width: int, height: int) -> jnp.ndarray:
    """[H, W, 3] with positive counts in R and negative in B (the encoding
    `Normalize_event_frame` decodes as ``(R − B)/(10/255)``)."""
    counts = event_count_image(x, y, p, width, height)
    r = jnp.clip(0.5 + jnp.maximum(counts, 0.0) * ACCUM_STEP, 0.0, 1.0)
    b = jnp.clip(0.5 + jnp.maximum(-counts, 0.0) * ACCUM_STEP, 0.0, 1.0)
    g = jnp.full_like(r, 0.5)
    return jnp.stack([r, g, b], axis=-1)


def decode_event_frame(img) -> jnp.ndarray:
    """Inverse of :func:`color_polarity_frame` (`Normalize_event_frame`)."""
    img = jnp.asarray(img)
    return (img[..., 0] - img[..., 2]) / ACCUM_STEP
