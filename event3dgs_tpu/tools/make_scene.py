"""Synthesize a `train_colmap_easy`-style COLMAP scene on disk.

The reference ships its simulated training scene as binary data; this tool
generates an equivalent one procedurally (BASELINE configs 1-2): a known
Gaussian world rendered with the oracle rasterizer along a camera orbit,
written out with the reference's 4-folder dataset contract
(`scene/dataset_readers.py:134-227`):

    <out>/
      sparse/0/{cameras.bin, images.bin, points3D.bin, points3D.ply}
      images/        train intensity frames (gray loss GT)
      images_event/  event-timed intensity frames (event-pair loss GT)
      renders/       held-out ground truth (eval protocol, `eval.py:118-152`)

All folders share the COLMAP poses; the init point cloud is the true
point set perturbed by `init_noise` (the scene must be *learned*, not
copied).  Usage:

    python -m event3dgs_tpu.tools.make_scene -o /tmp/train_colmap_easy \
        --views 100 --width 400 --height 400 --gaussians 400
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from event3dgs_tpu.data.colmap import (
    ColmapCamera,
    ColmapImage,
    rotmat2qvec,
    write_model,
)
from event3dgs_tpu.data.ply import store_point_cloud
from event3dgs_tpu.utils.image_io import save_image


def synthesize_scene(
    out_dir: str,
    n_views: int = 100,
    width: int = 400,
    height: int = 400,
    n_gaussians: int = 400,
    seed: int = 0,
    init_noise: float = 0.05,
    arc: float = 2.0 * np.pi,
    white_background: bool = False,
    blur_steps: int = 0,
    scale_min: float = 0.04,
    scale_max: float = 0.14,
    rasterizer: str = "reference",
    init_fraction: float = 1.0,
) -> dict:
    import jax.numpy as jnp

    from event3dgs_tpu.core.camera import make_camera
    from event3dgs_tpu.core.sh import rgb_to_sh
    from event3dgs_tpu.core.transforms import fov2focal
    from event3dgs_tpu.ops import render

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_gaussians, 3)) * np.array([0.9, 0.6, 0.9])
    cols = rng.uniform(0.1, 1.0, size=(n_gaussians, 3))
    # Splat size statistics. The defaults (0.04-0.14 world units ≈ 6-20 px
    # screen radius at 400×400 from the 4-unit orbit) make an easy dense
    # scene for the short recipes, but the reference's hardcoded 20 px
    # screen-size prune (active after the first opacity reset) then kills
    # the model mid-schedule (RESULTS_r3 gray_30k finding).  For the full
    # 30k vanilla schedule (BASELINE config 4) pass photographic statistics
    # — e.g. --gaussians 6000 --scale_min 0.004 --scale_max 0.015 keeps
    # splats at the sub-5 px radii the prune was tuned for.
    scales = np.exp(
        rng.uniform(np.log(scale_min), np.log(scale_max), size=(n_gaussians, 1))
    )
    scales = np.tile(scales, (1, 3)) * rng.uniform(
        0.7, 1.4, size=(n_gaussians, 3)
    )
    quats = rng.normal(size=(n_gaussians, 4))
    opac = rng.uniform(0.55, 0.95, size=n_gaussians)

    means = jnp.asarray(pts, jnp.float32)
    feats = jnp.zeros((n_gaussians, 16, 3), jnp.float32)
    feats = feats.at[:, 0, :].set(rgb_to_sh(jnp.asarray(cols, jnp.float32)))
    scales_j = jnp.asarray(scales, jnp.float32)
    quats_j = jnp.asarray(quats, jnp.float32)
    opac_j = jnp.asarray(opac, jnp.float32)

    fov_x, fov_y = 1.0, 1.0 if width == height else 0.8
    # orbit poses (same geometry as data/synthetic.py: orbit_cameras), kept
    # explicit here because the COLMAP writer needs the raw R/t
    radius, cam_height = 4.0, 0.6
    poses = []  # (R_c2w, t_w2c)
    for i in range(n_views):
        theta = arc * i / n_views
        pos = np.array(
            [radius * np.sin(theta), cam_height, -radius * np.cos(theta)]
        )
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        r_c2w = np.stack([right, up2, fwd], axis=1)
        poses.append((r_c2w, -r_c2w.T @ pos))
    cams = [
        make_camera(r, t, fov_x, fov_y, width, height) for r, t in poses
    ]

    for sub in ("sparse/0", "images", "images_event", "renders",
                "images_blurry"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    # white background keeps the event loss's log-intensity differences
    # bounded (a black background makes log(I+eps) singular at silhouettes)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    rendered = []
    for i, cam in enumerate(cams):
        img = np.clip(np.array(
            render(means, feats, opac_j, scales_j, quats_j, cam, bg,
                   sh_degree=0, rasterizer=rasterizer).image
        ), 0.0, 1.0)
        rendered.append(img)
        name = f"r_{i:05d}.png"
        for folder in ("images", "images_event", "renders"):
            save_image(os.path.join(out_dir, folder, name), img)

    # blurry captures for the deblur mode (BASELINE config 3): synthetic
    # motion blur over the shutter = mean of interpolated-pose renders,
    # the same construction the reference's blur synthesis uses (18-step
    # interpolation, `render.py`).  Off by default: it multiplies the
    # oracle render count by blur_steps; pass --blur_steps 6 when the
    # deblur recipe needs the folder.
    from event3dgs_tpu.tools.render_products import slerp_pose

    for i in range(n_views if blur_steps > 0 else 0):
        r0, t0 = poses[i]
        r1, t1 = poses[(i + 1) % n_views]
        acc = np.zeros_like(rendered[0])
        for s in range(blur_steps):
            alpha = s / blur_steps
            r, t = slerp_pose(r0, t0, r1, t1, alpha)
            cam = make_camera(r, t, fov_x, fov_y, width, height)
            acc += np.clip(np.array(
                render(means, feats, opac_j, scales_j, quats_j, cam, bg,
                       sh_degree=0, rasterizer=rasterizer).image
            ), 0.0, 1.0)
        save_image(
            os.path.join(out_dir, "images_blurry", f"r_{i:05d}.png"),
            acc / blur_steps,
        )

    # COLMAP model: shared PINHOLE intrinsics, per-view extrinsics.  The
    # loader stores R = qvec2rotmat(qvec).T and our orbit cameras carry
    # R_c2w, so qvec encodes the w2c rotation (R_c2w.T).
    focal_x = fov2focal(fov_x, width)
    focal_y = fov2focal(fov_y, height)
    colmap_cams = {
        1: ColmapCamera(
            id=1, model="PINHOLE", width=width, height=height,
            params=np.array([focal_x, focal_y, width / 2.0, height / 2.0]),
        )
    }
    colmap_images = {}
    for i, (r_c2w, tvec) in enumerate(poses):
        colmap_images[i + 1] = ColmapImage(
            id=i + 1,
            qvec=rotmat2qvec(r_c2w.T),
            tvec=tvec,
            camera_id=1,
            name=f"r_{i:05d}.png",
        )

    sparse = os.path.join(out_dir, "sparse", "0")
    init_pts = pts + rng.normal(size=pts.shape) * init_noise
    init_rgb = np.clip(cols * 255.0, 0, 255)
    if init_fraction < 1.0:
        # sparse initialization (densification stress): keep only a random
        # fraction of the true points — clone/split must rediscover the
        # rest (the regime where the reference's policy shows large gains,
        # `scene/gaussian_model.py:349-407`)
        keep = rng.choice(
            n_gaussians,
            size=max(int(round(n_gaussians * init_fraction)), 1),
            replace=False,
        )
        init_pts = init_pts[keep]
        init_rgb = init_rgb[keep]
    write_model(colmap_cams, colmap_images, (init_pts, init_rgb), sparse)
    store_point_cloud(
        os.path.join(sparse, "points3D.ply"), init_pts, init_rgb
    )
    return dict(
        n_views=n_views, width=width, height=height,
        n_gaussians=n_gaussians,
        true_model=dict(means=pts, colors=cols, scales=scales, quats=quats,
                        opacities=opac),
    )


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Synthesize a train_colmap_easy-style COLMAP scene"
    )
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--views", type=int, default=100)
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--gaussians", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init_noise", type=float, default=0.05)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--blur_steps", type=int, default=0)
    p.add_argument("--scale_min", type=float, default=0.04)
    p.add_argument("--scale_max", type=float, default=0.14)
    p.add_argument("--arc", type=float, default=2.0 * np.pi)
    p.add_argument("--init_fraction", type=float, default=1.0,
                   help="fraction of true points kept in the init cloud "
                        "(sparse-init densification stress)")
    p.add_argument("--rasterizer", type=str, default="reference",
                   choices=["reference", "tiled"])
    args = p.parse_args(argv)
    meta = synthesize_scene(
        args.output, args.views, args.width, args.height, args.gaussians,
        args.seed, args.init_noise, arc=args.arc,
        white_background=args.white_background,
        blur_steps=args.blur_steps,
        scale_min=args.scale_min, scale_max=args.scale_max,
        rasterizer=args.rasterizer,
        init_fraction=args.init_fraction,
    )
    print(f"wrote {meta['n_views']}-view scene to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
