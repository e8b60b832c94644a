"""Tests for COLMAP parsing, scene loading, and the dataset contract."""

import json
import os

import numpy as np
import pytest

from event3dgs_tpu.data.colmap import (
    ColmapCamera,
    ColmapImage,
    qvec2rotmat,
    rotmat2qvec,
    read_model,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)
from event3dgs_tpu.data.scene import (
    build_camera_batch,
    detect_scene_type,
    load_images_array,
    read_blender_scene,
    read_colmap_scene,
    resolve_resolution,
)


def make_fake_colmap_scene(root, n_views=6, w=64, h=48, folders=("images",)):
    """Write a synthetic COLMAP scene with images."""
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    cams = {1: ColmapCamera(1, "PINHOLE", w, h, np.array([60.0, 60.0, w / 2, h / 2]))}
    rng = np.random.default_rng(0)
    images = {}
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        q = np.array([np.cos(theta / 2), 0.0, np.sin(theta / 2), 0.0])
        t = rng.normal(size=3) * 0.1 + np.array([0, 0, 4.0])
        images[i + 1] = ColmapImage(i + 1, q, t, 1, f"frame_{i:03d}.png")
    write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
    write_images_binary(images, os.path.join(sparse, "images.bin"))
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, (50, 3))
    write_points3d_binary(xyz, rgb, os.path.join(sparse, "points3D.bin"))
    for folder in folders:
        d = os.path.join(root, folder)
        os.makedirs(d, exist_ok=True)
        for i in range(n_views):
            arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"frame_{i:03d}.png"))
    return xyz, rgb


class TestColmapCodec:
    def test_qvec_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0])
        R = qvec2rotmat(q)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-6)

    def test_binary_roundtrip(self, tmp_path):
        xyz, rgb = make_fake_colmap_scene(str(tmp_path), folders=())
        cams, images, points = read_model(str(tmp_path / "sparse" / "0"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64
        assert len(images) == 6
        assert images[1].name == "frame_000.png"
        np.testing.assert_allclose(points[0], xyz, atol=1e-12)
        np.testing.assert_array_equal(points[1], rgb)


class TestSceneLoading:
    def test_colmap_scene(self, tmp_path):
        make_fake_colmap_scene(str(tmp_path), folders=("images", "images_event"))
        info = read_colmap_scene(str(tmp_path), event=True)
        assert len(info.train_cameras) == 6
        assert len(info.event_cameras) == 6
        assert len(info.test_cameras) == 0  # no renders/ folder
        assert info.point_cloud is not None
        assert info.radius > 0
        assert detect_scene_type(str(tmp_path)) == "colmap"

    def test_gray_mode_colors(self, tmp_path):
        make_fake_colmap_scene(str(tmp_path))
        info = read_colmap_scene(str(tmp_path), gray=True)
        np.testing.assert_allclose(info.point_cloud.colors, 0.5)

    def test_camera_batch_and_images(self, tmp_path):
        make_fake_colmap_scene(str(tmp_path))
        info = read_colmap_scene(str(tmp_path))
        batch = build_camera_batch(info.train_cameras)
        assert batch.batch_shape == (6,)
        assert (batch.width, batch.height) == (64, 48)
        imgs = load_images_array(info.train_cameras)
        assert imgs.shape == (6, 48, 64, 3)
        assert imgs.min() >= 0 and imgs.max() <= 1

    def test_blender_scene(self, tmp_path):
        from PIL import Image

        frames = []
        os.makedirs(tmp_path / "train", exist_ok=True)
        for i in range(3):
            c2w = np.eye(4)
            c2w[2, 3] = 4.0 + i
            frames.append(
                {"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()}
            )
            arr = np.zeros((32, 40, 4), np.uint8)
            arr[:, :, 3] = 255
            Image.fromarray(arr).save(tmp_path / "train" / f"r_{i}.png")
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
        info = read_blender_scene(str(tmp_path))
        assert len(info.train_cameras) == 3
        assert info.point_cloud.points.shape == (100_000, 3)
        assert detect_scene_type(str(tmp_path)) == "blender"

    def test_resolution_policy(self):
        assert resolve_resolution(3200, 2400, -1) == (1600, 1200)
        assert resolve_resolution(800, 600, -1) == (800, 600)
        assert resolve_resolution(800, 600, 2) == (400, 300)
        assert resolve_resolution(800, 600, 400) == (400, 300)
