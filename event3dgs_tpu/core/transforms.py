"""Camera / projection / quaternion math as pure, batched jnp functions.

Numerically matches the reference formulas (reference: Event-3DGS
`utils/graphics_utils.py:31-77`, `utils/general_utils.py:78-110`) but is
written vectorized-first: every function accepts arbitrary leading batch
dimensions and is jit/vmap/grad-safe.

Conventions (kept identical to the reference so PLY files, cameras.json and
checkpoints interoperate):

- ``world_to_view`` returns the W2C matrix in *row-vector* convention, i.e.
  the transpose of the usual column-vector W2C; points transform as
  ``p_hom @ M`` (reference stores `world_view_transform` transposed,
  `scene/cameras.py:54`).
- The perspective projection maps z into [0, 1] (DirectX-style), reference
  `utils/graphics_utils.py:51-71`, and is also returned in row-vector
  convention (transposed).
- Quaternions are scalar-first ``(w, x, y, z)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fov2focal(fov, pixels):
    """Focal length in pixels from field-of-view (reference `graphics_utils.py:73`)."""
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal, pixels):
    """Field-of-view from focal length in pixels (reference `graphics_utils.py:76`)."""
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def world_to_view(R, t, translate=None, scale=1.0):
    """Build the (transposed) world-to-camera matrix.

    Args:
        R: [..., 3, 3] camera rotation (world-from-camera, as stored by the
            COLMAP reader — the reference keeps R transposed relative to the
            COLMAP qvec, `scene/dataset_readers.py:84`).
        t: [..., 3] camera translation (COLMAP tvec).
        translate: optional [3] scene recentering applied to the camera
            center, reference `graphics_utils.py:38-49`.
        scale: optional scalar rescaling of the camera center.

    Returns:
        [..., 4, 4] matrix in row-vector convention: ``p_hom @ M`` maps world
        points to camera coordinates.
    """
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    batch = R.shape[:-2]
    # Column-vector W2C: [[Rᵀ, t], [0, 1]].
    w2c = jnp.zeros(batch + (4, 4), jnp.float32)
    w2c = w2c.at[..., :3, :3].set(jnp.swapaxes(R, -1, -2))
    w2c = w2c.at[..., :3, 3].set(t)
    w2c = w2c.at[..., 3, 3].set(1.0)
    if translate is not None or scale != 1.0:
        translate = jnp.zeros(3) if translate is None else jnp.asarray(translate)
        c2w = jnp.linalg.inv(w2c)
        center = (c2w[..., :3, 3] + translate) * scale
        c2w = c2w.at[..., :3, 3].set(center)
        w2c = jnp.linalg.inv(c2w)
    # Row-vector convention (transpose) to match the reference's stored form.
    return jnp.swapaxes(w2c, -1, -2)


def perspective_projection(znear, zfar, fov_x, fov_y):
    """Perspective projection with z in [0, 1], transposed (row-vector form).

    Reference `utils/graphics_utils.py:51-71` (returned matrix there is
    column-vector; the camera stores its transpose, `scene/cameras.py:55`).
    Symmetric frustum, so the (0,2)/(1,2) off-center terms are zero.
    """
    tan_x = jnp.tan(jnp.asarray(fov_x, jnp.float32) / 2.0)
    tan_y = jnp.tan(jnp.asarray(fov_y, jnp.float32) / 2.0)
    zn = jnp.float32(znear)
    zf = jnp.float32(zfar)
    # Column-vector matrix entries.
    p00 = 1.0 / tan_x
    p11 = 1.0 / tan_y
    p22 = zf / (zf - zn)
    p23 = -(zf * zn) / (zf - zn)
    batch = jnp.broadcast_shapes(jnp.shape(tan_x), jnp.shape(tan_y))
    P = jnp.zeros(batch + (4, 4), jnp.float32)
    P = P.at[..., 0, 0].set(p00)
    P = P.at[..., 1, 1].set(p11)
    P = P.at[..., 2, 2].set(p22)
    P = P.at[..., 2, 3].set(p23)
    P = P.at[..., 3, 2].set(1.0)
    # Row-vector convention.
    return jnp.swapaxes(P, -1, -2)


def quat_to_rotmat(q):
    """Normalize quaternions and convert to rotation matrices.

    Args:
        q: [..., 4] scalar-first quaternions (need not be normalized; the
            normalization is part of the op and is differentiated through,
            matching reference `general_utils.py:78-99`).

    Returns:
        [..., 3, 3] rotation matrices.
    """
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def build_covariance(scaling, rotation, scaling_modifier=1.0):
    """3D covariance Σ = (R S)(R S)ᵀ from per-Gaussian scales and quaternions.

    Args:
        scaling: [..., 3] positive scales (already activated, i.e. exp-space).
        rotation: [..., 4] scalar-first quaternions (unnormalized ok).
        scaling_modifier: global scalar multiplier on scales.

    Returns:
        [..., 3, 3] full covariance matrices.

    Reference: `general_utils.py:101-110` + `gaussian_model.py:27-31`.
    """
    R = quat_to_rotmat(rotation)
    s = scaling * scaling_modifier
    L = R * s[..., None, :]  # R @ diag(s)
    return L @ jnp.swapaxes(L, -1, -2)


def covariance_to_symm6(cov):
    """Pack symmetric 3x3 covariances into 6-vectors (xx, xy, xz, yy, yz, zz).

    Matches the reference's `strip_symmetric` layout (`general_utils.py:64-76`)
    used for the rasterizer's `cov3D_precomp` input.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def symm6_to_covariance(sym):
    """Inverse of :func:`covariance_to_symm6`."""
    xx, xy, xz, yy, yz, zz = (sym[..., i] for i in range(6))
    rows = [
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def inverse_sigmoid(x):
    """log(x / (1-x)) — inverse of the opacity activation (`general_utils.py:18`)."""
    x = jnp.asarray(x)
    return jnp.log(x / (1.0 - x))
