"""Photometric losses and color transforms.

Image layout is **[..., H, W, C] channel-last** throughout (TPU-friendly),
unlike the reference's torch [C, H, W].  Formulas match
`utils/loss_utils.py` / `utils/image_utils.py`:

- grayscale: ITU-R 601 luma 0.299/0.587/0.114 (`loss_utils.py:18-23`);
- LUV-L: the X-channel weights 0.4124/0.35758/0.1804 (`loss_utils.py:24-28`)
  used by the differentiable event simulation;
- SSIM: 11×11 gaussian window, σ=1.5, C1=0.01², C2=0.03²
  (`loss_utils.py:359-418`), implemented as a separable depthwise conv.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_GRAY_WEIGHTS = (0.299, 0.587, 0.114)
_LUV_WEIGHTS = (0.4124, 0.35758, 0.1804)


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] → [..., H, W, 1] luma; passthrough if already 1-chan."""
    if img.shape[-1] == 1:
        return img
    w = jnp.asarray(_GRAY_WEIGHTS, img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def rgb_to_luv_l(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] → [..., H, W, 1] CIE-X-ish channel (`rgb_to_LUVscale`)."""
    if img.shape[-1] == 1:
        return img
    w = jnp.asarray(_LUV_WEIGHTS, img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Peak SNR in dB for images in [0, 1] (`image_utils.py:19-21`)."""
    return -10.0 * jnp.log10(jnp.mean((a - b) ** 2) + 1e-12)


def l1_loss_gray(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L1 between grayscale conversions (`loss_utils.py:40-48`)."""
    return l1_loss(rgb_to_grayscale(a), rgb_to_grayscale(b))


@lru_cache(maxsize=8)
def _gauss_window_1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur on [H, W, C], SAME padding.

    Equivalent to the reference's 2D conv with an outer-product window
    (`loss_utils.py:363-367`): the window is separable by construction.
    """
    c = img.shape[-1]
    g = jnp.asarray(_gauss_window_1d(window_size, sigma))
    x = img[None]  # [1, H, W, C]
    kh = jnp.tile(g.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = window_size // 2
    # HIGHEST: TPU convs default to bf16 passes, whose ~1e-2 rounding breaks
    # the SSIM map's Cauchy-Schwarz bound (measured mean SSIM up to 1.03 on
    # near-identical images); the reference computes in f32 CUDA.
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [H, W, C] images (`loss_utils.py:388-418`)."""
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def ssim_gray(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM on grayscale conversions (`loss_utils.py:368-385`)."""
    return ssim(rgb_to_grayscale(img1), rgb_to_grayscale(img2), window_size)


def rgb_to_qe_scale(img: jnp.ndarray) -> jnp.ndarray:
    """Quantum-efficiency-weighted gray conversion (reference
    `rgb_to_QEscale`, `loss_utils.py:29-33`): XYZ-X-row weights
    0.4124/0.35758/0.1804, channel-last in, [..., H, W, 1] out."""
    w = jnp.asarray([0.4124, 0.35758, 0.1804], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)
