"""Image IO helpers (PIL-based; the environment has no cv2)."""

from __future__ import annotations

import numpy as np


def save_image(path: str, img) -> None:
    """Save [H, W, 3] or [H, W, 1] float image in [0, 1] as PNG."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image_f32(path: str) -> np.ndarray:
    """Load an image as float32 [H, W, 3] in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return arr
