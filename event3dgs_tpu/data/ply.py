"""Minimal PLY codec + Gaussian checkpoint PLY with the reference schema.

The environment has no `plyfile`, so this implements the little-endian binary
PLY subset the 3DGS ecosystem uses (single `vertex` element, scalar float/uchar
properties).  The Gaussian attribute schema is byte-compatible with the
reference (`scene/gaussian_model.py:177-208`): ``x y z nx ny nz f_dc_{0..2}
f_rest_{0..3(K-1)-1} opacity scale_{0..2} rot_{0..3}``, all float32, with
``f_rest`` flattened **channel-major** (the reference transposes [N,K-1,3] →
[N,3,K-1] before flattening).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

_PLY_DTYPES = {
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "char": np.int8,
    "short": np.int16,
    "ushort": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
}
_PLY_NAMES = {np.dtype(np.float32): "float", np.dtype(np.float64): "double",
              np.dtype(np.uint8): "uchar", np.dtype(np.int32): "int"}


class PointCloud(NamedTuple):
    points: np.ndarray  # [N, 3]
    colors: np.ndarray  # [N, 3] in [0, 1]
    normals: np.ndarray  # [N, 3]


def read_ply(path: str) -> dict[str, np.ndarray]:
    """Read a binary/ascii little-endian PLY's vertex element into a dict of
    per-property arrays."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = None
        props: list[tuple[str, np.dtype]] = []
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tokens = line.strip().decode("ascii", "replace").split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                in_vertex = tokens[1] == "vertex"
                if in_vertex:
                    n_vertex = int(tokens[2])
            elif tokens[0] == "property" and in_vertex:
                if tokens[1] == "list":
                    raise ValueError("list properties unsupported")
                props.append((tokens[2], np.dtype(_PLY_DTYPES[tokens[1]])))
            elif tokens[0] == "end_header":
                break
        if n_vertex is None:
            raise ValueError(f"{path}: no vertex element")
        if fmt == "binary_little_endian":
            rec = np.dtype([(name, dt) for name, dt in props])
            data = np.frombuffer(f.read(rec.itemsize * n_vertex), dtype=rec)
        elif fmt == "ascii":
            raw = np.loadtxt(f, max_rows=n_vertex, ndmin=2)
            rec = np.dtype([(name, dt) for name, dt in props])
            data = np.zeros(n_vertex, rec)
            for i, (name, _) in enumerate(props):
                data[name] = raw[:, i]
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return {name: np.ascontiguousarray(data[name]) for name, _ in props}


def write_ply(path: str, fields: dict[str, np.ndarray]) -> None:
    """Write a binary little-endian single-element PLY from {name: [N]}."""
    names = list(fields)
    n = len(fields[names[0]])
    rec = np.dtype(
        [(k, np.dtype(np.asarray(fields[k]).dtype)) for k in names]
    )
    data = np.empty(n, rec)
    for k in names:
        data[k] = np.asarray(fields[k])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for k in names:
            f.write(f"property {_PLY_NAMES[np.dtype(data[k].dtype)]} {k}\n".encode())
        f.write(b"end_header\n")
        f.write(data.tobytes())


def fetch_point_cloud(path: str) -> PointCloud:
    """Read an SfM points3D.ply (reference `fetchPly`,
    `scene/dataset_readers.py:109-115`)."""
    v = read_ply(path)
    points = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float64)
    colors = (
        np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float64) / 255.0
    )
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float64)
    else:
        normals = np.zeros_like(points)
    return PointCloud(points=points, colors=colors, normals=normals)


def store_point_cloud(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Write an SfM-style PLY (reference `storePly`,
    `scene/dataset_readers.py:117-132`); rgb in [0, 255]."""
    xyz = np.asarray(xyz, np.float32)
    fields = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(len(xyz), np.float32),
        "ny": np.zeros(len(xyz), np.float32),
        "nz": np.zeros(len(xyz), np.float32),
        "red": np.asarray(rgb[:, 0], np.uint8),
        "green": np.asarray(rgb[:, 1], np.uint8),
        "blue": np.asarray(rgb[:, 2], np.uint8),
    }
    write_ply(path, fields)


def save_gaussian_ply(path: str, params) -> None:
    """Save trained Gaussians with the reference's attribute schema
    (`gaussian_model.py:191-208`); only alive slots are written."""
    alive = np.asarray(params.alive)
    xyz = np.asarray(params.xyz, np.float32)[alive]
    f_dc = np.asarray(params.features_dc, np.float32)[alive]  # [n,1,3]
    f_rest = np.asarray(params.features_rest, np.float32)[alive]  # [n,K-1,3]
    opacity = np.asarray(params.opacity, np.float32)[alive]  # [n,1]
    scaling = np.asarray(params.scaling, np.float32)[alive]
    rotation = np.asarray(params.rotation, np.float32)[alive]
    n = xyz.shape[0]

    fields: dict[str, np.ndarray] = {}
    for i, k in enumerate("xyz"):
        fields[k] = xyz[:, i]
    for k in ("nx", "ny", "nz"):
        fields[k] = np.zeros(n, np.float32)
    # channel-major flatten, matching the reference's transpose(1, 2);
    # explicit column counts so an empty (collapsed) model still writes a
    # schema-complete header instead of crashing on reshape(0, -1)
    dc_t = f_dc.transpose(0, 2, 1).reshape(n, f_dc.shape[1] * f_dc.shape[2])
    for i in range(dc_t.shape[1]):
        fields[f"f_dc_{i}"] = dc_t[:, i]
    rest_t = f_rest.transpose(0, 2, 1).reshape(
        n, f_rest.shape[1] * f_rest.shape[2]
    )
    for i in range(rest_t.shape[1]):
        fields[f"f_rest_{i}"] = rest_t[:, i]
    fields["opacity"] = opacity[:, 0]
    for i in range(scaling.shape[1]):
        fields[f"scale_{i}"] = scaling[:, i]
    for i in range(rotation.shape[1]):
        fields[f"rot_{i}"] = rotation[:, i]
    write_ply(path, fields)


def load_gaussian_ply(path: str, capacity: int | None = None, max_sh_degree: int = 3):
    """Load a Gaussian PLY (reference `load_ply`, `gaussian_model.py:215-256`)
    into fixed-capacity :class:`GaussianParams` buffers."""
    import jax.numpy as jnp

    from event3dgs_tpu.models.gaussians import GaussianParams

    v = read_ply(path)
    n = len(v["x"])
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < {n} gaussians in {path}")
    k = (max_sh_degree + 1) ** 2

    n_rest = sum(1 for key in v if key.startswith("f_rest_"))
    if n_rest != 3 * (k - 1):
        raise ValueError(
            f"{path} has {n_rest} f_rest coeffs; expected {3 * (k - 1)} "
            f"for sh degree {max_sh_degree}"
        )

    def build(shape, fill=0.0):
        return np.full((cap,) + shape, fill, np.float32)

    xyz = build((3,))
    xyz[:n] = np.stack([v["x"], v["y"], v["z"]], axis=1)
    f_dc = build((1, 3))
    for c in range(3):
        f_dc[:n, 0, c] = v[f"f_dc_{c}"]
    # stored channel-major: index = channel * (K-1) + coeff
    f_rest = build((k - 1, 3))
    for c in range(3):
        for j in range(k - 1):
            f_rest[:n, j, c] = v[f"f_rest_{c * (k - 1) + j}"]
    opacity = build((1,))
    opacity[:n, 0] = v["opacity"]
    scaling = build((3,))
    for i in range(3):
        scaling[:n, i] = v[f"scale_{i}"]
    rotation = build((4,))
    rotation[:, 0] = 1.0
    for i in range(4):
        rotation[:n, i] = v[f"rot_{i}"]
    alive = np.zeros(cap, bool)
    alive[:n] = True

    return GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity),
        alive=jnp.asarray(alive),
    )
