"""Render products: view sets, pose interpolation, blur/event synthesis.

Implements the reference `render.py` capabilities (SURVEY §2.1 "Render entry
point", `render.py:45-420`):

- render train/test camera sets to PNG folders;
- camera-pose interpolation (normalized-lerp on quaternions + linear
  translation, `render.py:32-44,98-106`);
- synthetic motion blur: average of ``blur_steps`` interpolated renders over
  a shutter window (`render_set_blurry:222-293`);
- event-stream synthesis: densely interpolated renders through the DVS
  simulator (`render_set_event:136-215`);
- depth and point-depth products (`render_set_depth/point`);
- `transforms_train.json` export (`render.py:110-128`).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import Camera, make_camera
from event3dgs_tpu.data.colmap import qvec2rotmat, rotmat2qvec
from event3dgs_tpu.models import activated
from event3dgs_tpu.ops import render, render_depth
from event3dgs_tpu.utils.image_io import save_image


def _render_view(params, cam, sh_degree, bg, rasterizer="reference"):
    act = activated(params)
    return render(
        act.means3d, act.features, act.opacities, act.scales, act.rotations,
        cam, bg, sh_degree=sh_degree, rasterizer=rasterizer,
    ).image


def nlerp_pose(R0, t0, R1, t1, alpha: float):
    """Normalized-lerp between two camera poses (`render.py:32-44`)."""
    q0, q1 = rotmat2qvec(R0), rotmat2qvec(R1)
    if np.dot(q0, q1) < 0:
        q1 = -q1
    q = (1 - alpha) * q0 + alpha * q1
    q /= np.linalg.norm(q)
    t = (1 - alpha) * np.asarray(t0) + alpha * np.asarray(t1)
    return qvec2rotmat(q), t


def slerp_pose(R0, t0, R1, t1, alpha: float):
    """Spherical-lerp between two camera poses (reference `Slerp`,
    `render.py:37-44`), with the sign flip for quaternion double cover and
    linear translation interpolation."""
    q0, q1 = rotmat2qvec(R0), rotmat2qvec(R1)
    if np.dot(q0, q1) < 0:
        q1 = -q1
    cos_fi = np.clip(np.dot(q0, q1), -1.0, 1.0)
    fi = np.arccos(cos_fi)
    s = np.sin(fi)
    if s < 1e-6:  # nearly parallel: nlerp limit
        q = (1 - alpha) * q0 + alpha * q1
    else:
        q = np.sin(fi * (1 - alpha)) / s * q0 + np.sin(fi * alpha) / s * q1
    q /= np.linalg.norm(q)
    t = (1 - alpha) * np.asarray(t0) + alpha * np.asarray(t1)
    return qvec2rotmat(q), t


def interpolated_cameras(cam_infos, steps: int, width: int, height: int):
    """Camera chain with ``steps`` in-between poses per source interval."""
    cams, tags = [], []
    for i in range(len(cam_infos) - 1):
        a, b = cam_infos[i], cam_infos[i + 1]
        for s in range(steps):
            alpha = s / steps
            R, t = nlerp_pose(a.R, a.T, b.R, b.T, alpha)
            cams.append(make_camera(R, t, a.fov_x, a.fov_y, width, height))
            tags.append((i, s))
    last = cam_infos[-1]
    cams.append(
        make_camera(last.R, last.T, last.fov_x, last.fov_y, width, height)
    )
    tags.append((len(cam_infos) - 1, 0))
    return cams, tags


def render_set(
    params, cameras: Camera, out_dir: str, sh_degree=3, bg=None,
    gt_images=None, rasterizer="reference",
):
    """Render a camera set to `renders/` (+ `gt/`), reference
    `render_set`-style layout."""
    bg = jnp.zeros(3) if bg is None else bg
    rdir = os.path.join(out_dir, "renders")
    os.makedirs(rdir, exist_ok=True)
    n = cameras.batch_shape[0]
    for i in range(n):
        cam = jax.tree.map(lambda x: x[i], cameras)
        img = _render_view(params, cam, sh_degree, bg, rasterizer)
        save_image(os.path.join(rdir, f"{i:05d}.png"), np.clip(np.asarray(img), 0, 1))
    if gt_images is not None:
        gdir = os.path.join(out_dir, "gt")
        os.makedirs(gdir, exist_ok=True)
        for i in range(n):
            save_image(os.path.join(gdir, f"{i:05d}.png"),
                       np.asarray(gt_images[i]))


def render_depth_set(params, cameras: Camera, out_dir: str, bg=None):
    """Depth maps scaled by /10 like the reference PNGs
    (`render_set_depth:322-342`)."""
    bg = jnp.zeros(3) if bg is None else bg
    os.makedirs(out_dir, exist_ok=True)
    act = activated(params)
    n = cameras.batch_shape[0]
    for i in range(n):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render_depth(
            act.means3d, act.opacities, act.scales, act.rotations, cam, bg
        )
        save_image(
            os.path.join(out_dir, f"depth_{i:05d}.png"),
            np.clip(np.asarray(out.image[..., 0]) / 10.0, 0, 1),
        )


def point_depth_map(params, cam: Camera, opacity_threshold=0.8):
    """Min-splat z-buffer of high-opacity Gaussian centers
    (`render_point`/`generate_depth_map`, `gaussian_renderer/__init__.py:
    194-378`) — vectorized scatter-min instead of the reference's CPU loop."""
    from event3dgs_tpu.ops.projection import project_gaussians

    act = activated(params)
    proj = project_gaussians(
        act.means3d, act.scales, act.rotations, cam, opacities=act.opacities
    )
    keep = proj.valid & (act.opacities > opacity_threshold)
    dist = jnp.linalg.norm(act.means3d - cam.camera_center[None], axis=-1)
    xi = jnp.clip(proj.mean2d[:, 0].astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(proj.mean2d[:, 1].astype(jnp.int32), 0, cam.height - 1)
    flat_idx = jnp.where(keep, yi * cam.width + xi, cam.width * cam.height)
    depth = jnp.full(cam.width * cam.height + 1, jnp.inf)
    depth = depth.at[flat_idx].min(jnp.where(keep, dist, jnp.inf))
    return depth[:-1].reshape(cam.height, cam.width)


def render_blurry_set(
    params, cam_infos, out_dir: str, width, height, sh_degree=3,
    blur_steps: int = 18, shutter_fraction: float = 0.5, bg=None,
    rasterizer="reference",
):
    """Synthetic motion blur: mean of interpolated renders over a shutter
    window (`render_set_blurry:222-293`, 18 steps)."""
    bg = jnp.zeros(3) if bg is None else bg
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(cam_infos) - 1):
        a, b = cam_infos[i], cam_infos[i + 1]
        acc = None
        for s in range(blur_steps):
            alpha = shutter_fraction * s / blur_steps
            R, t = nlerp_pose(a.R, a.T, b.R, b.T, alpha)
            cam = make_camera(R, t, a.fov_x, a.fov_y, width, height)
            img = _render_view(params, cam, sh_degree, bg, rasterizer)
            acc = img if acc is None else acc + img
        save_image(
            os.path.join(out_dir, f"blurry_{i:05d}.png"),
            np.clip(np.asarray(acc) / blur_steps, 0, 1),
        )


def render_event_set(
    params, cam_infos, out_dir: str, width, height, sh_degree=3,
    interpolation: int = 3, dt: float = 1000.0, dvs_params=None, bg=None,
    rasterizer="reference",
):
    """Event synthesis: interpolated render chain → DVS sim → raw.dat +
    event frames (`render_set_event:136-215`)."""
    from event3dgs_tpu.events.simulate import (
        generate_event_frames,
        save_event_result,
        simulate_event_camera,
    )

    bg = jnp.zeros(3) if bg is None else bg
    os.makedirs(out_dir, exist_ok=True)
    cams, _ = interpolated_cameras(cam_infos, interpolation, width, height)
    frames = []
    for i, cam in enumerate(cams):
        img = np.clip(
            np.asarray(_render_view(params, cam, sh_degree, bg, rasterizer)),
            0, 1,
        )
        frames.append(img)
        save_image(os.path.join(out_dir, f"render_{i:05d}.png"), img)
    buf = simulate_event_camera(frames, dt=dt, params=dvs_params)
    save_event_result(buf, out_dir, width=width, height=height)
    generate_event_frames(
        buf, width, height, int(dt * interpolation),
        out_dir=os.path.join(out_dir, "frames"),
    )
    return buf


def export_transforms_json(cam_infos, out_path: str):
    """`transforms_train.json` export (`render.py:110-128`)."""
    frames = []
    for i, ci in enumerate(cam_infos):
        w2c = np.eye(4)
        w2c[:3, :3] = ci.R.T
        w2c[:3, 3] = ci.T
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1  # COLMAP → OpenGL axes
        frames.append(
            {
                "file_path": f"train/r_{i}",
                "transform_matrix": c2w.tolist(),
            }
        )
    payload = {"camera_angle_x": cam_infos[0].fov_x, "frames": frames}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
