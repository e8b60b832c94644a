"""Evaluation entry point (reference `eval.py:217-250`).

    python -m event3dgs_tpu.cli.evaluate -m <model> [--start_checkpoint C]

Evaluates on the manual holdout views {5, 25, 45, 65, 85} against the
`renders/` ground-truth folder, gray-converted, printing SSIM/PSNR (and
LPIPS when weights are configured) like `eval.py:152`.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from event3dgs_tpu.cli.common import load_run_config
from event3dgs_tpu.data.ply import load_gaussian_ply
from event3dgs_tpu.data.scene import (
    build_camera_batch,
    load_images_array,
    read_colmap_scene,
)
from event3dgs_tpu.tools.evaluation import evaluate_holdout
from event3dgs_tpu.train.checkpoint import find_max_iteration


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate a trained model")
    p.add_argument("--model_path", "-m", type=str, required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--save_images", action="store_true")
    p.add_argument(
        "--e2vid", type=str, default=None,
        help="score an external intensity-reconstruction folder instead of "
             "rendering (reference eval.py --e2vid mode)",
    )
    p.add_argument(
        "--rasterizer", type=str, default="tiled",
        choices=["tiled", "reference"],
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from event3dgs_tpu.cli.common import claim_accelerator

    claim_accelerator()
    cfg = load_run_config(args.model_path)
    m = cfg.model

    it = args.iteration if args.iteration > 0 else find_max_iteration(
        args.model_path
    )
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
    )
    params = load_gaussian_ply(ply, max_sh_degree=m.sh_degree)

    info = read_colmap_scene(m.source_path, images_dir=m.images, gray=m.gray,
                             deblur=m.deblur, event=m.event)
    if not info.test_cameras:
        print("no renders/ ground-truth folder found — nothing to evaluate")
        return 1
    cams = build_camera_batch(info.test_cameras, m.resolution)
    gt = jnp.asarray(
        load_images_array(info.test_cameras, m.resolution, m.white_background)
    )
    bg = jnp.ones(3) if m.white_background else jnp.zeros(3)

    if args.e2vid:
        # score an external reconstruction (e.g. E2VID output) at the holdout
        # indices instead of our renders (`eval.py:123-152`)
        import numpy as np

        from event3dgs_tpu.losses import psnr, ssim
        from event3dgs_tpu.losses.basic import rgb_to_grayscale
        from event3dgs_tpu.train.loop import TEST_VIEW_INDICES
        from event3dgs_tpu.utils.image_io import load_image_f32

        names = sorted(os.listdir(args.e2vid))
        ssims, psnrs = [], []
        for idx in TEST_VIEW_INDICES:
            if idx >= len(names) or idx >= gt.shape[0]:
                continue
            rec = jnp.asarray(
                load_image_f32(os.path.join(args.e2vid, names[idx]))
            )
            g = jnp.repeat(rgb_to_grayscale(gt[idx]), 3, axis=-1)
            r = jnp.repeat(rgb_to_grayscale(rec), 3, axis=-1)
            ssims.append(float(ssim(r, g)))
            psnrs.append(float(psnr(r, g)))
        print(f"[SSIM {np.mean(ssims):.4f} PSNR {np.mean(psnrs):.2f}] (e2vid)")
        return 0

    out = evaluate_holdout(
        params, cams, gt, sh_degree=m.sh_degree, background=bg,
        save_dir=os.path.join(args.model_path, "images")
        if args.save_images else None,
        lpips_weights=args.lpips_weights,
        rasterizer=args.rasterizer,
    )
    lp = f" LPiPS {out['LPIPS']:.4f}" if "LPIPS" in out else ""
    print(f"[SSIM {out['SSIM']:.4f} PSNR {out['PSNR']:.2f}{lp}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
