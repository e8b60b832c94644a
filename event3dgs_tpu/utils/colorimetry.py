"""Colorimetry: sRGB → luminance for physically-based simulator input.

Equivalent of the reference's `sgrb2lum` C++/OpenCV extension
(`Event_sensor/utils/display.cpp`, `SGRB2Luminance`): converts sRGB frames
to photometric luminance for the DVS model.  The reference routes through
31-band spectral tables; photometrically the composition collapses to
linearized sRGB → CIE Y (the spectral round trip is the identity on the
luminance axis), so this implements the direct form in jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709/sRGB primaries → CIE Y row of the RGB→XYZ matrix
_Y_WEIGHTS = (0.2126729, 0.7151522, 0.0721750)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Inverse sRGB EOTF (IEC 61966-2-1)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055
    )


def srgb_to_luminance(img: jnp.ndarray, max_nits: float = 255.0) -> jnp.ndarray:
    """[..., H, W, 3] sRGB in [0,1] → photometric luminance in (0, max_nits].

    Drop-in for `sgrb2lum.SGRB2Luminance` as used by the simulator input
    path (`Event_sensor/utils/test.py:15`).
    """
    lin = srgb_to_linear(img)
    w = jnp.asarray(_Y_WEIGHTS, img.dtype)
    y = jnp.sum(lin * w, axis=-1)
    return jnp.maximum(y * max_nits, 1e-3)
