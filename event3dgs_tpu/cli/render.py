"""Render entry point (reference `render.py:397-420`).

    python -m event3dgs_tpu.cli.render -m <model_path> [--skip_train]
        [--skip_test] [--depth] [--point] [--blurrySpeed K]
        [--event --interpolationN 3] [--iteration N]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from event3dgs_tpu.cli.common import load_run_config
from event3dgs_tpu.data.ply import load_gaussian_ply
from event3dgs_tpu.data.scene import (
    build_camera_batch,
    detect_scene_type,
    load_images_array,
    read_blender_scene,
    read_colmap_scene,
    resolve_resolution,
)
from event3dgs_tpu.tools.render_products import (
    export_transforms_json,
    render_blurry_set,
    render_depth_set,
    render_event_set,
    render_set,
)
from event3dgs_tpu.train.checkpoint import find_max_iteration


def build_parser():
    p = argparse.ArgumentParser(description="Render a trained model")
    p.add_argument("--model_path", "-m", type=str, required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--depth", action="store_true")
    p.add_argument("--point", action="store_true")
    p.add_argument("--event", action="store_true")
    p.add_argument("--blurrySpeed", type=int, default=0)
    p.add_argument("--interpolationN", type=int, default=3)
    p.add_argument("--dt", type=float, default=1000.0)
    p.add_argument("--export_transforms", action="store_true")
    p.add_argument(
        "--rasterizer", type=str, default="tiled",
        choices=["tiled", "reference"],
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_run_config(args.model_path)
    m = cfg.model

    it = args.iteration if args.iteration > 0 else find_max_iteration(
        args.model_path
    )
    ply = os.path.join(
        args.model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply"
    )
    params = load_gaussian_ply(ply, max_sh_degree=m.sh_degree)
    print(f"Rendering {args.model_path} @ iteration {it} "
          f"({int(params.alive.sum())} gaussians)")

    kind = detect_scene_type(m.source_path)
    if kind == "colmap":
        info = read_colmap_scene(m.source_path, images_dir=m.images,
                                 gray=m.gray, deblur=m.deblur, event=m.event)
    else:
        info = read_blender_scene(m.source_path, m.white_background)

    bg = jnp.ones(3) if m.white_background else jnp.zeros(3)
    base = os.path.join(args.model_path, "train", f"ours_{it}")
    w, h = resolve_resolution(
        info.train_cameras[0].width, info.train_cameras[0].height, m.resolution
    )

    if not args.skip_train:
        cams = build_camera_batch(info.train_cameras, m.resolution)
        gt = load_images_array(info.train_cameras, m.resolution,
                               m.white_background)
        render_set(params, cams, base, m.sh_degree, bg, gt,
                   rasterizer=args.rasterizer)
        print(f"wrote {base}/renders")
    if not args.skip_test and info.test_cameras:
        cams = build_camera_batch(info.test_cameras, m.resolution)
        gt = load_images_array(info.test_cameras, m.resolution,
                               m.white_background)
        tdir = os.path.join(args.model_path, "test", f"ours_{it}")
        render_set(params, cams, tdir, m.sh_degree, bg, gt,
                   rasterizer=args.rasterizer)
        print(f"wrote {tdir}/renders")
    if args.depth:
        cams = build_camera_batch(info.train_cameras, m.resolution)
        render_depth_set(params, cams, os.path.join(base, "depth"), bg)
        print("wrote depth maps")
    if args.point:
        import numpy as np
        import jax

        from event3dgs_tpu.tools.render_products import point_depth_map
        from event3dgs_tpu.utils.image_io import save_image

        cams = build_camera_batch(info.train_cameras, m.resolution)
        pdir = os.path.join(base, "point")
        os.makedirs(pdir, exist_ok=True)
        for i in range(cams.batch_shape[0]):
            cam = jax.tree.map(lambda x: x[i], cams)
            d = np.asarray(point_depth_map(params, cam))
            finite = np.isfinite(d)
            if finite.any():
                d = np.where(finite, d, d[finite].max())
                d = (d - d.min()) / max(d.max() - d.min(), 1e-9)
            else:
                d = np.zeros_like(d)
            save_image(os.path.join(pdir, f"point_{i:05d}.png"), 1.0 - d)
        print("wrote point-depth maps")
    if args.blurrySpeed > 0:
        render_blurry_set(
            params, info.train_cameras, os.path.join(base, "blurry"),
            w, h, m.sh_degree, bg=bg, rasterizer=args.rasterizer,
        )
        print("wrote blurry set")
    if args.event:
        render_event_set(
            params, info.train_cameras, os.path.join(base, "event"),
            w, h, m.sh_degree, interpolation=args.interpolationN,
            dt=args.dt, bg=bg, rasterizer=args.rasterizer,
        )
        print("wrote event synthesis")
    if args.export_transforms:
        export_transforms_json(
            info.train_cameras,
            os.path.join(args.model_path, "transforms_train.json"),
        )
        print("wrote transforms_train.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
