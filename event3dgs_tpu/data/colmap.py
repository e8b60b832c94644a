"""COLMAP sparse-model parsing (binary and text).

Self-contained reimplementation of the COLMAP model format (reference:
`scene/colmap_loader.py:43-294`; the format itself is public COLMAP).  Only
the pieces the pipeline needs: camera intrinsics, image extrinsics, and 3D
points, from `cameras/images/points3D.{bin,txt}`.
"""

from __future__ import annotations

import os
import struct
from typing import NamedTuple

import numpy as np


class ColmapCamera(NamedTuple):
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


class ColmapImage(NamedTuple):
    id: int
    qvec: np.ndarray  # [4] scalar-first world→camera quaternion
    tvec: np.ndarray  # [3]
    camera_id: int
    name: str


# COLMAP camera model ids → (name, #params)
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
_MODEL_BY_NAME = {name: (mid, n) for mid, (name, n) in _CAMERA_MODELS.items()}


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """Scalar-first quaternion → rotation matrix (reference
    `colmap_loader.py:30-41`)."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → scalar-first quaternion (standard eigen method)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    q = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def _read(f, n, fmt):
    return struct.unpack("<" + fmt, f.read(n))


def read_cameras_binary(path: str) -> dict[int, ColmapCamera]:
    cams = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            cid, mid, w, h = _read(f, 24, "iiQQ")
            name, n_params = _CAMERA_MODELS[mid]
            params = np.array(_read(f, 8 * n_params, "d" * n_params))
            cams[cid] = ColmapCamera(cid, name, int(w), int(h), params)
    return cams


def read_cameras_text(path: str) -> dict[int, ColmapCamera]:
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cid = int(parts[0])
            cams[cid] = ColmapCamera(
                cid, parts[1], int(parts[2]), int(parts[3]),
                np.array([float(p) for p in parts[4:]]),
            )
    return cams


def read_images_binary(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            vals = _read(f, 64, "idddddddi")
            iid = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            cam_id = vals[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (n_pts,) = _read(f, 8, "Q")
            f.seek(24 * n_pts, os.SEEK_CUR)  # skip 2D points (x, y, point3D id)
            images[iid] = ColmapImage(iid, qvec, tvec, cam_id, name.decode())
    return images


def read_images_text(path: str) -> dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        # keep blank 2D-point lines so header/points pairing stays aligned
        lines = [ln.strip() for ln in f if not ln.startswith("#")]
    # two lines per image: header + 2D points (possibly empty)
    for header in lines[0::2]:
        if not header:
            continue
        parts = header.split()
        iid = int(parts[0])
        images[iid] = ColmapImage(
            iid,
            np.array([float(p) for p in parts[1:5]]),
            np.array([float(p) for p in parts[5:8]]),
            int(parts[8]),
            parts[9],
        )
    return images


def read_points3d_binary(path: str):
    """Returns (xyz [N,3], rgb [N,3] uint8, error [N])."""
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        xyz = np.empty((num, 3))
        rgb = np.empty((num, 3), np.uint8)
        err = np.empty(num)
        for i in range(num):
            vals = _read(f, 43, "QdddBBBd")
            xyz[i] = vals[1:4]
            rgb[i] = vals[4:7]
            err[i] = vals[7]
            (track_len,) = _read(f, 8, "Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    return xyz, rgb, err


def read_points3d_text(path: str):
    xyz, rgb, err = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            xyz.append([float(p) for p in parts[1:4]])
            rgb.append([int(p) for p in parts[4:7]])
            err.append(float(parts[7]))
    return np.array(xyz), np.array(rgb, np.uint8), np.array(err)


def write_cameras_binary(cams: dict[int, ColmapCamera], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for c in cams.values():
            mid, n = _MODEL_BY_NAME[c.model]
            f.write(struct.pack("<iiQQ", c.id, mid, c.width, c.height))
            f.write(struct.pack("<" + "d" * len(c.params), *c.params))


def write_images_binary(images: dict[int, ColmapImage], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(
                struct.pack(
                    "<idddddddi", im.id, *im.qvec, *im.tvec, im.camera_id
                )
            )
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points


def write_points3d_binary(xyz: np.ndarray, rgb: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(
                struct.pack(
                    "<QdddBBBd", i + 1, *xyz[i], *np.asarray(rgb[i], np.uint8), 0.0
                )
            )
            f.write(struct.pack("<Q", 0))  # empty track


def write_cameras_text(cams: dict[int, ColmapCamera], path: str) -> None:
    """Text-format camera writer (`utils/readwrite_model.py` equivalent)."""
    with open(path, "w") as f:
        f.write("# Camera list with one line of data per camera:\n"
                "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for c in cams.values():
            params = " ".join(repr(float(p)) for p in c.params)
            f.write(f"{c.id} {c.model} {c.width} {c.height} {params}\n")


def write_images_text(images: dict[int, ColmapImage], path: str) -> None:
    """Text-format image writer; 2D-point lines are left empty."""
    with open(path, "w") as f:
        f.write("# Image list with two lines of data per image:\n"
                "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
                "#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for im in images.values():
            q = " ".join(repr(float(v)) for v in im.qvec)
            t = " ".join(repr(float(v)) for v in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n\n")


def write_points3d_text(xyz: np.ndarray, rgb: np.ndarray, path: str) -> None:
    """Text-format points3D writer with empty tracks."""
    with open(path, "w") as f:
        f.write("# 3D point list with one line of data per point:\n"
                "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[]\n")
        for i in range(len(xyz)):
            p = " ".join(repr(float(v)) for v in xyz[i])
            c = " ".join(str(int(v)) for v in np.asarray(rgb[i], np.uint8))
            f.write(f"{i + 1} {p} {c} 0.0\n")


def write_model(
    cams: dict[int, ColmapCamera],
    images: dict[int, ColmapImage],
    points,
    out_dir: str,
    ext: str = ".bin",
) -> None:
    """Write a full COLMAP sparse model in binary or text form.

    Equivalent of the reference's standalone `utils/readwrite_model.py`
    `write_model` (`readwrite_model.py:106-566`); ``points`` is
    ``(xyz, rgb[, err])`` or None for an empty point set.
    """
    os.makedirs(out_dir, exist_ok=True)
    if points is None:
        xyz, rgb = np.zeros((0, 3)), np.zeros((0, 3), np.uint8)
    else:
        xyz, rgb = points[0], points[1]
    if ext == ".bin":
        write_cameras_binary(cams, os.path.join(out_dir, "cameras.bin"))
        write_images_binary(images, os.path.join(out_dir, "images.bin"))
        write_points3d_binary(xyz, rgb, os.path.join(out_dir, "points3D.bin"))
    elif ext == ".txt":
        write_cameras_text(cams, os.path.join(out_dir, "cameras.txt"))
        write_images_text(images, os.path.join(out_dir, "images.txt"))
        write_points3d_text(xyz, rgb, os.path.join(out_dir, "points3D.txt"))
    else:
        raise ValueError(f"unknown model extension {ext!r}")


def read_model(sparse_dir: str):
    """Read a COLMAP sparse model (binary preferred, text fallback).

    Returns (cameras dict, images dict, (xyz, rgb, err) or None).
    """
    def pick(name):
        b = os.path.join(sparse_dir, name + ".bin")
        t = os.path.join(sparse_dir, name + ".txt")
        if os.path.exists(b):
            return b, True
        if os.path.exists(t):
            return t, False
        raise FileNotFoundError(f"{name}.bin/.txt not found in {sparse_dir}")

    cpath, cbin = pick("cameras")
    ipath, ibin = pick("images")
    cams = read_cameras_binary(cpath) if cbin else read_cameras_text(cpath)
    images = read_images_binary(ipath) if ibin else read_images_text(ipath)
    points = None
    for reader, ext in ((read_points3d_binary, ".bin"), (read_points3d_text, ".txt")):
        p = os.path.join(sparse_dir, "points3D" + ext)
        if os.path.exists(p):
            points = reader(p)
            break
    return cams, images, points
