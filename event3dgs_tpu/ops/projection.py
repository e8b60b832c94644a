"""Gaussian preprocess: frustum culling + EWA projection to screen space.

Computes, fully vectorized over N Gaussians (and vmap-able over cameras), the
per-Gaussian screen-space quantities the rasterizer consumes: 2D mean in pixel
coordinates, view-space depth, the conic (inverse 2D covariance), and the
3-sigma pixel radius.

The math follows the standard 3DGS forward conventions (EWA splatting with a
local affine Jacobian, +0.3 screen-space dilation, 3σ radius from the largest
eigenvalue) that the reference's CUDA rasterizer implements — see SURVEY §2.3
(`submodules/diff-gaussian-rasterization`, recovered from call sites at
`gaussian_renderer/__init__.py:38-97`).  Everything is differentiable jnp;
gradients flow to means/scales/rotations/opacities through this preprocess.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import Camera
from event3dgs_tpu.core.transforms import build_covariance

# Culling / numeric conventions shared with the upstream kernel family.
NEAR_CULL_Z = 0.2  # view-space z below which Gaussians are culled
PROJ_EPS = 1e-7  # added to the homogeneous w before division
DILATION = 0.3  # screen-space covariance dilation (antialiasing floor)


class ProjectedGaussians(NamedTuple):
    """Screen-space per-Gaussian data (all [N] or [N, k])."""

    mean2d: jnp.ndarray  # [N, 2] pixel coordinates (x, y)
    depth: jnp.ndarray  # [N] view-space z (culled → +inf)
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # [N] 3σ radius in pixels (float; 0 for culled)
    valid: jnp.ndarray  # [N] bool visibility after culling


def ndc2pix(v, size):
    """NDC [-1, 1] → continuous pixel coordinate, 3DGS convention.

    ``((v + 1) * S - 1) / 2`` — quoted by the reference at
    `gaussian_renderer/__init__.py:238-243`.
    """
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    camera: Camera,
    scaling_modifier: float = 1.0,
    cov3d: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N Gaussians into a camera's screen space.

    Args:
        means3d: [N, 3] world-space centers.
        scales: [N, 3] activated (positive) scales.
        rotations: [N, 4] quaternions (unnormalized ok).
        camera: a single (unbatched) :class:`Camera`.
        scaling_modifier: global scale multiplier.
        cov3d: optional [N, 3, 3] precomputed world covariance (overrides
            scales/rotations, mirroring the reference's `cov3D_precomp` path).
        opacities: optional [N] activated opacities; when given, Gaussians
            with opacity < 1/255 are culled — they can never pass the
            rasterizer's minimum-alpha cutoff, so this is exact.  This is how
            dead (alive-mask=False) slots of the fixed-capacity model are
            skipped for free.

    Returns:
        :class:`ProjectedGaussians`.
    """
    n = means3d.shape[0]
    hom = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], axis=-1)

    # View / clip transforms (row-vector convention; see core.camera).  Full
    # f32 precision: the default TPU matmul would round these to bf16.
    p_view = jnp.matmul(hom, camera.world_view, precision=jax.lax.Precision.HIGHEST)
    p_clip = jnp.matmul(hom, camera.full_proj, precision=jax.lax.Precision.HIGHEST)
    tz = p_view[:, 2]
    in_front = tz > NEAR_CULL_Z

    p_ndc = p_clip[:, :3] / (p_clip[:, 3:4] + PROJ_EPS)
    mean2d = jnp.stack(
        [ndc2pix(p_ndc[:, 0], camera.width), ndc2pix(p_ndc[:, 1], camera.height)],
        axis=-1,
    )

    # --- EWA: cov2d = (J W) Σ (J W)ᵀ ---------------------------------------
    # Factored elementwise formulation: with Σ = L Lᵀ (L = R·diag(s)) and
    # u, v the two rows of J·W_rot, the 2×2 screen covariance is simply
    # a = |Lᵀu|², b = (Lᵀu)·(Lᵀv), c = |Lᵀv|².  This keeps everything as
    # N-vector elementwise ops — XLA's batched 3×3 einsum path is an order
    # of magnitude slower on TPU.
    fx = camera.width / (2.0 * camera.tan_fovx)
    fy = camera.height / (2.0 * camera.tan_fovy)

    # Clamp the view-space ray to 1.3× the frustum so the affine
    # approximation stays sane for off-screen Gaussians.
    safe_tz = jnp.where(in_front, tz, 1.0)
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    txz = jnp.clip(p_view[:, 0] / safe_tz, -lim_x, lim_x) * safe_tz
    tyz = jnp.clip(p_view[:, 1] / safe_tz, -lim_y, lim_y) * safe_tz

    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    # World→view rotation: our stored matrix is (W2C)ᵀ, so the rotation that
    # acts on column vectors is its top-left block transposed.
    Rw = camera.world_view[:3, :3].T  # [3, 3] constant per camera
    # Rows of J·W_rot as linear combinations of Rw's (constant) rows.
    u = (fx * inv_z)[:, None] * Rw[0][None, :] + (
        -fx * txz * inv_z2
    )[:, None] * Rw[2][None, :]
    v = (fy * inv_z)[:, None] * Rw[1][None, :] + (
        -fy * tyz * inv_z2
    )[:, None] * Rw[2][None, :]

    if cov3d is None:
        from event3dgs_tpu.core.transforms import quat_to_rotmat

        L = quat_to_rotmat(rotations) * (scales * scaling_modifier)[:, None, :]
        # Lᵀu, Lᵀv as broadcast-multiply + reduce (pure VPU work)
        wu = jnp.sum(L * u[:, :, None], axis=1)  # [N, 3]
        wv = jnp.sum(L * v[:, :, None], axis=1)
        a = jnp.sum(wu * wu, axis=-1) + DILATION
        b = jnp.sum(wu * wv, axis=-1)
        c = jnp.sum(wv * wv, axis=-1) + DILATION
    else:
        su = jnp.einsum("nij,nj->ni", cov3d, u)
        sv = jnp.einsum("nij,nj->ni", cov3d, v)
        a = jnp.sum(u * su, axis=-1) + DILATION
        b = jnp.sum(u * sv, axis=-1)
        c = jnp.sum(v * sv, axis=-1) + DILATION

    det = a * c - b * b
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / safe_det, -b / safe_det, a / safe_det], axis=-1)

    # 3σ radius from the largest eigenvalue of the 2x2 covariance.
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    # On-screen test: the Gaussian's 3σ disc must intersect the image.
    on_screen = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < camera.width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < camera.height)
    )
    valid = in_front & det_ok & on_screen
    if opacities is not None:
        valid = valid & (jax.lax.stop_gradient(opacities) >= 1.0 / 255.0)

    depth = jnp.where(valid, tz, jnp.inf)
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(
        mean2d=mean2d, depth=depth, conic=conic, radius=radius, valid=valid
    )
