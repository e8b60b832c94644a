"""Synthetic test scenes: a known Gaussian "world" + camera paths + GT renders.

Fills the role of the reference's `train_colmap_easy` simulated scene
(BASELINE config 1) without shipping binary data: a procedurally generated
cluster of colored Gaussians is rendered with the oracle rasterizer from a
camera orbit to produce ground-truth intensity frames; training then starts
from a perturbed/subsampled point cloud and must recover the scene.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from event3dgs_tpu.core.camera import Camera, make_camera, stack_cameras
from event3dgs_tpu.core.sh import rgb_to_sh


class SyntheticScene(NamedTuple):
    cameras: Camera  # batched camera pytree [V]
    images: jnp.ndarray  # [V, H, W, 3] GT renders
    points: np.ndarray  # [N, 3] init point cloud (perturbed truth)
    colors: np.ndarray  # [N, 3] init colors
    extent: float  # nerf++-style scene radius
    true_model: dict  # the generating gaussian parameters


def orbit_cameras(
    n_views: int,
    radius: float = 4.0,
    height: float = 0.6,
    width: int = 128,
    img_height: int = 96,
    fov_x: float = 1.0,
    fov_y: float = 0.8,
    arc: float = 2.0 * np.pi,
) -> list[Camera]:
    """Cameras on a circular orbit, all looking at the origin."""
    cams = []
    for i in range(n_views):
        theta = arc * i / n_views
        pos = np.array(
            [radius * np.sin(theta), height, -radius * np.cos(theta)]
        )
        # look-at rotation: camera z-axis towards origin (COLMAP convention)
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])  # COLMAP y points down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_c2w = np.stack([right, up2, fwd], axis=1)  # columns = camera axes
        # reference stores R = R_c2w (transposed w2c rotation); t = w2c trans
        t = -R_c2w.T @ pos
        cams.append(make_camera(R_c2w, t, fov_x, fov_y, width, img_height))
    return cams


def make_synthetic_scene(
    n_gaussians: int = 120,
    n_views: int = 24,
    width: int = 128,
    height: int = 96,
    seed: int = 0,
    init_noise: float = 0.03,
    arc: float = 2.0 * np.pi,
) -> SyntheticScene:
    """Generate the scene and render GT images with the oracle rasterizer."""
    from event3dgs_tpu.ops import render

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_gaussians, 3)) * np.array([0.9, 0.6, 0.9])
    cols = rng.uniform(0.1, 1.0, size=(n_gaussians, 3))
    scales = np.exp(rng.uniform(np.log(0.04), np.log(0.14), size=(n_gaussians, 1)))
    scales = np.tile(scales, (1, 3)) * rng.uniform(0.7, 1.4, size=(n_gaussians, 3))
    quats = rng.normal(size=(n_gaussians, 4))
    opac = rng.uniform(0.55, 0.95, size=n_gaussians)

    means = jnp.asarray(pts, jnp.float32)
    k = 16
    feats = jnp.zeros((n_gaussians, k, 3), jnp.float32)
    feats = feats.at[:, 0, :].set(rgb_to_sh(jnp.asarray(cols, jnp.float32)))
    scales_j = jnp.asarray(scales, jnp.float32)
    quats_j = jnp.asarray(quats, jnp.float32)
    opac_j = jnp.asarray(opac, jnp.float32)

    cams = orbit_cameras(n_views, width=width, img_height=height, arc=arc)
    bg = jnp.zeros(3)
    images = []
    for cam in cams:
        out = render(means, feats, opac_j, scales_j, quats_j, cam, bg, sh_degree=0)
        images.append(out.image)
    images = jnp.clip(jnp.stack(images), 0.0, 1.0)

    centers = np.stack([np.array(c.camera_center) for c in cams])
    center = centers.mean(axis=0, keepdims=True)
    extent = float(np.max(np.linalg.norm(centers - center, axis=1)) * 1.1)

    init_pts = pts + rng.normal(size=pts.shape) * init_noise
    return SyntheticScene(
        cameras=stack_cameras(cams),
        images=images,
        points=init_pts,
        colors=cols,
        extent=extent,
        true_model=dict(
            means=pts, colors=cols, scales=scales, quats=quats, opacities=opac
        ),
    )
