"""LPIPS perceptual metric in JAX (AlexNet backbone + linear heads).

Reimplements the LPIPS v0.1 architecture the reference vendors
(`lpipsPyTorch/modules/lpips.py:8-36`, `networks.py`, `utils.py`): ImageNet
normalization, backbone feature extraction at 5 stages, channelwise unit
normalization, 1×1 linear heads, spatial averaging, and summation over
stages.

This environment has no network egress and no torchvision, so **pretrained
weights cannot be downloaded**; the metric therefore loads weights from an
`.npz` provided by the user (converted from the torch checkpoints with
:func:`convert_torch_weights`).  Without weights :func:`lpips_fn` returns
None and the eval tooling reports SSIM/PSNR only — mirroring how the
reference degrades when `lpips` is missing.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics used by LPIPS's scaling layer (`modules/utils.py`)
_SHIFT = np.array([0.485, 0.456, 0.406], np.float32)
_SCALE = np.array([0.229, 0.224, 0.225], np.float32)

# AlexNet feature config: (out_channels, kernel, stride, padding) per conv,
# with maxpool positions as in torchvision's AlexNet.features
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after convs 0 and 1 (and after 4, unused)


def _conv(x, w, b, stride, padding):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _normalize_channels(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def alexnet_features(params: dict, x: jnp.ndarray) -> list:
    """Five relu-stage feature maps of AlexNet for [N, H, W, 3] input."""
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def lpips_distance(params: dict, img1: jnp.ndarray, img2: jnp.ndarray):
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    def prep(im):
        im = (im - _SHIFT) / _SCALE
        return im[None]

    f1 = alexnet_features(params, prep(img1))
    f2 = alexnet_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize_channels(a) - _normalize_channels(b)) ** 2
        head = params[f"lin{i}_w"]  # [C] non-negative weights (1x1 conv)
        total = total + jnp.mean(jnp.sum(d * head, axis=-1))
    return total


def load_weights(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def convert_torch_weights(alexnet_state: dict, lpips_state: dict, out_path: str):
    """Convert torch AlexNet.features + LPIPS linear-head state dicts to npz.

    ``alexnet_state``: torchvision AlexNet ``features`` state dict (keys like
    `0.weight` [Cout, Cin, kh, kw]); ``lpips_state``: LPIPS lin-layer dict
    (keys like `lin0.model.1.weight` [1, C, 1, 1]).
    """
    conv_idx = [0, 3, 6, 8, 10]
    out = {}
    for i, ci in enumerate(conv_idx):
        w = np.asarray(alexnet_state[f"{ci}.weight"])
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        out[f"conv{i}_b"] = np.asarray(alexnet_state[f"{ci}.bias"])
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lin.{i}.model.1.weight"):
            if key in lpips_state:
                out[f"lin{i}_w"] = np.asarray(lpips_state[key])[0, :, 0, 0]
                break
    np.savez(out_path, **out)


def lpips_fn(weights_path: Optional[str] = None) -> Optional[Callable]:
    """Return a jitted LPIPS callable, or None if weights are unavailable.

    Looks at ``weights_path``, then ``$EVENT3DGS_LPIPS_WEIGHTS``.
    """
    path = weights_path or os.environ.get("EVENT3DGS_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    params = load_weights(path)
    return jax.jit(partial(lpips_distance, params))
