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


# VGG16 features: conv out-channels with 'M' maxpool markers; LPIPS taps the
# relu after each block (relu1_2, 2_2, 3_3, 4_3, 5_3) — `networks.py` VGG16.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_VGG_TAPS = {1, 3, 6, 9, 12}  # conv indices whose relu is a tapped stage


def vgg16_features(params: dict, x: jnp.ndarray) -> list:
    """Five relu-stage feature maps of VGG16 for [N, H, W, 3] input."""
    feats = []
    ci = 0
    for item in _VGG_CFG:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        x = _conv(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], 1, 1)
        x = jax.nn.relu(x)
        if ci in _VGG_TAPS:
            feats.append(x)
        ci += 1
    return feats


def _fire(x, params, name):
    """SqueezeNet fire module: 1×1 squeeze → relu → concat(1×1, 3×3 expand)."""
    s = jax.nn.relu(_conv(x, params[f"{name}_s_w"], params[f"{name}_s_b"], 1, 0))
    e1 = jax.nn.relu(_conv(s, params[f"{name}_e1_w"], params[f"{name}_e1_b"], 1, 0))
    e3 = jax.nn.relu(_conv(s, params[f"{name}_e3_w"], params[f"{name}_e3_b"], 1, 1))
    return jnp.concatenate([e1, e3], axis=-1)


def _ceil_maxpool(x):
    """3×3 stride-2 maxpool with ceil_mode=True (torch SqueezeNet)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-(h - 3)) % 2
    pw = (-(w - 3)) % 2
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                constant_values=-jnp.inf)
    return _maxpool(x)


def squeezenet_features(params: dict, x: jnp.ndarray) -> list:
    """Seven tapped stages of SqueezeNet 1.1 (`networks.py` squeeze,
    N_slices=7): conv1 | pool+fire1-2 | pool+fire3-4 | pool+fire5 | fire6 |
    fire7 | fire8."""
    feats = []
    x = jax.nn.relu(_conv(x, params["conv0_w"], params["conv0_b"], 2, 0))
    feats.append(x)
    x = _ceil_maxpool(x)
    x = _fire(x, params, "fire1")
    x = _fire(x, params, "fire2")
    feats.append(x)
    x = _ceil_maxpool(x)
    x = _fire(x, params, "fire3")
    x = _fire(x, params, "fire4")
    feats.append(x)
    x = _ceil_maxpool(x)
    x = _fire(x, params, "fire5")
    feats.append(x)
    x = _fire(x, params, "fire6")
    feats.append(x)
    x = _fire(x, params, "fire7")
    feats.append(x)
    x = _fire(x, params, "fire8")
    feats.append(x)
    return feats


_BACKBONES = {
    "alex": (alexnet_features, 5),
    "vgg": (vgg16_features, 5),
    "squeeze": (squeezenet_features, 7),
}


def lpips_distance(params: dict, img1: jnp.ndarray, img2: jnp.ndarray,
                   net: str = "alex"):
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    def prep(im):
        im = (im - _SHIFT) / _SCALE
        return im[None]

    features, n_stages = _BACKBONES[net]
    f1 = features(params, prep(img1))
    f2 = features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize_channels(a) - _normalize_channels(b)) ** 2
        head = params[f"lin{i}_w"]  # [C] non-negative weights (1x1 conv)
        total = total + jnp.mean(jnp.sum(d * head, axis=-1))
    return total


def load_weights(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def convert_torch_weights(alexnet_state: dict, lpips_state: dict, out_path: str,
                          net: str = "alex"):
    """Convert torch backbone `.features` + LPIPS linear-head dicts to npz.

    ``alexnet_state``: torchvision ``features`` state dict for the chosen
    backbone (keys like `0.weight` [Cout, Cin, kh, kw]); ``lpips_state``:
    LPIPS lin-layer dict (keys like `lin0.model.1.weight` [1, C, 1, 1]).
    Supported nets: alex (5 convs), vgg (13 convs), squeeze (conv + 8 fires).
    """
    out = {}

    def conv(src_key, dst_name):
        w = np.asarray(alexnet_state[f"{src_key}.weight"])
        out[f"{dst_name}_w"] = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        out[f"{dst_name}_b"] = np.asarray(alexnet_state[f"{src_key}.bias"])

    if net == "alex":
        for i, ci in enumerate([0, 3, 6, 8, 10]):
            conv(str(ci), f"conv{i}")
        n_heads = 5
    elif net == "vgg":
        for i, ci in enumerate([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]):
            conv(str(ci), f"conv{i}")
        n_heads = 5
    elif net == "squeeze":
        conv("0", "conv0")
        for i, fi in enumerate([3, 4, 6, 7, 9, 10, 11, 12]):
            conv(f"{fi}.squeeze", f"fire{i + 1}_s")
            conv(f"{fi}.expand1x1", f"fire{i + 1}_e1")
            conv(f"{fi}.expand3x3", f"fire{i + 1}_e3")
        n_heads = 7
    else:
        raise ValueError(f"unknown LPIPS backbone {net!r}")
    for i in range(n_heads):
        for key in (f"lin{i}.model.1.weight", f"lin.{i}.model.1.weight",
                    f"lins.{i}.model.1.weight"):
            if key in lpips_state:
                out[f"lin{i}_w"] = np.asarray(lpips_state[key])[0, :, 0, 0]
                break
    np.savez(out_path, **out)


def lpips_fn(weights_path: Optional[str] = None,
             net: str = "alex") -> Optional[Callable]:
    """Return a jitted LPIPS callable, or None if weights are unavailable.

    Looks at ``weights_path``, then ``$EVENT3DGS_LPIPS_WEIGHTS``.  ``net``
    picks the backbone (alex/vgg/squeeze) — the reference uses alex for
    training-time eval (`image_utils.py:22-41`) and vgg in `metrics.py`.
    """
    path = weights_path or os.environ.get("EVENT3DGS_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        import warnings

        warnings.warn(
            "LPIPS weights not found"
            + (f" at {path!r}" if path else "")
            + ": evaluation will report SSIM/PSNR ONLY and omit LPIPS. "
            "To enable it, download the torch LPIPS v0.1 checkpoint on a "
            "machine with network access (pip install lpips; "
            "lpips.LPIPS(net='alex') caches torchvision alexnet + linear "
            "heads), convert with "
            "event3dgs_tpu.losses.lpips.convert_torch_weights(out='lpips_"
            "alex.npz'), and point $EVENT3DGS_LPIPS_WEIGHTS (or "
            "--lpips_weights) at the .npz.",
            stacklevel=2,
        )
        return None
    params = load_weights(path)
    return jax.jit(partial(lpips_distance, params, net=net))
