"""Evaluation protocol + offline metrics (reference eval.py / metrics.py).

- :func:`evaluate_holdout`: the Event-3DGS protocol — render the manual
  test views {5, 25, 45, 65, 85}, grayscale both render and GT, report
  SSIM/PSNR/LPIPS means (`eval.py:118-152`).
- :func:`metrics_over_dirs`: the 3DGS `metrics.py` equivalent — score
  renders/ vs gt/ image folders into `results.json` / `per_view.json`
  (`metrics.py:36-103`).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.losses import psnr, ssim
from event3dgs_tpu.losses.basic import rgb_to_grayscale
from event3dgs_tpu.losses.lpips import lpips_fn
from event3dgs_tpu.models import activated
from event3dgs_tpu.ops import render
from event3dgs_tpu.train.loop import TEST_VIEW_INDICES


def evaluate_holdout(
    params,
    cameras,
    gt_images,
    sh_degree: int = 3,
    background=None,
    indices=TEST_VIEW_INDICES,
    save_dir: str | None = None,
    lpips_weights: str | None = None,
    rasterizer: str = "reference",
) -> dict:
    """Reference eval protocol on the manual holdout views.

    Renders each index, converts render and GT to grayscale (3-channel, as
    `eval.py:132-137` stacks the gray channel), computes SSIM/PSNR (and
    LPIPS when weights are available), optionally saves sim_/real_ pairs.
    """
    act = activated(params)
    bg = jnp.zeros(3) if background is None else background
    lp = lpips_fn(lpips_weights)

    ssims, psnrs, lpips_vals = [], [], []
    n_views = gt_images.shape[0]
    for idx in indices:
        if idx >= n_views:
            continue
        cam = jax.tree.map(lambda x: x[idx], cameras)
        img = render(
            act.means3d, act.features, act.opacities, act.scales,
            act.rotations, cam, bg, sh_degree=sh_degree, rasterizer=rasterizer,
        ).image
        img = jnp.clip(img, 0.0, 1.0)
        gt = jnp.clip(gt_images[idx], 0.0, 1.0)
        img_g = jnp.repeat(rgb_to_grayscale(img), 3, axis=-1)
        gt_g = jnp.repeat(rgb_to_grayscale(gt), 3, axis=-1)
        ssims.append(float(ssim(img_g, gt_g)))
        psnrs.append(float(psnr(img_g, gt_g)))
        if lp is not None:
            lpips_vals.append(float(lp(img_g, gt_g)))
        if save_dir:
            from event3dgs_tpu.utils.image_io import save_image

            os.makedirs(save_dir, exist_ok=True)
            save_image(os.path.join(save_dir, f"sim_{idx:05d}.png"), img_g)
            save_image(os.path.join(save_dir, f"real_{idx:05d}.png"), gt_g)

    out = {
        "SSIM": float(np.mean(ssims)) if ssims else float("nan"),
        "PSNR": float(np.mean(psnrs)) if psnrs else float("nan"),
        "per_view_ssim": ssims,
        "per_view_psnr": psnrs,
        "indices": [i for i in indices if i < n_views],
    }
    if lpips_vals:
        out["LPIPS"] = float(np.mean(lpips_vals))
    return out


def metrics_over_dirs(
    renders_dir: str,
    gt_dir: str,
    out_dir: str | None = None,
    lpips_weights: str | None = None,
) -> dict:
    """Score a renders/ vs gt/ folder pair (reference `metrics.py:36-103`)."""
    from event3dgs_tpu.utils.image_io import load_image_f32

    names = sorted(os.listdir(renders_dir))
    lp = lpips_fn(lpips_weights)
    per_view = {"SSIM": {}, "PSNR": {}, "LPIPS": {}}
    for name in names:
        r = jnp.asarray(load_image_f32(os.path.join(renders_dir, name)))
        g = jnp.asarray(load_image_f32(os.path.join(gt_dir, name)))
        per_view["SSIM"][name] = float(ssim(r, g))
        per_view["PSNR"][name] = float(psnr(r, g))
        if lp is not None:
            per_view["LPIPS"][name] = float(lp(r, g))
    results = {
        k: float(np.mean(list(v.values()))) for k, v in per_view.items() if v
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(out_dir, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)
    return results
