"""High-level render entry points: model + camera → image.

Mirrors the reference renderer's semantics (`gaussian_renderer/__init__.py:
20-104`): SH→RGB is evaluated outside the rasterizer (the reference hard-sets
`convert_SHs_python=True` at `:74`), colors are ``clamp_min(eval_sh + 0.5, 0)``,
and the returned dict exposes the rendered image, per-Gaussian radii and a
visibility mask.

Differences by design (TPU-first):

- images are **[H, W, 3] channel-last** (TPU-friendly); CLI/IO convert;
- rendering is a pure function of arrays — no Python-side settings object;
- the screen-space densification gradient is obtained through an explicit
  ``mean2d_tap`` argument (a zeros [N, 2] array added to the projected
  means): ``jax.grad`` w.r.t. the tap yields exactly what the reference
  reads from ``screenspace_points.grad`` (`train.py:319-320`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import Camera
from event3dgs_tpu.core.sh import eval_sh
from event3dgs_tpu.ops.projection import ProjectedGaussians, project_gaussians
from event3dgs_tpu.ops.rasterize_reference import rasterize_reference


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [H, W, 3]
    radii: jnp.ndarray  # [N] pixel radii (0 for culled)
    visibility: jnp.ndarray  # [N] bool, radius > 0


class RenderPartials(NamedTuple):
    """Pre-background compositing partials for Gaussian-sharded rendering."""

    rgb: jnp.ndarray  # [H, W, 3] accumulated color (no background)
    logt: jnp.ndarray  # [H, W] log final transmittance
    radii: jnp.ndarray  # [N] pixel radii (0 for culled)
    visibility: jnp.ndarray  # [N] bool, radius > 0
    depth: jnp.ndarray  # [N] view-space z (+inf for culled)


def gaussian_colors(
    sh_degree: int,
    features: jnp.ndarray,
    means3d: jnp.ndarray,
    camera_center: jnp.ndarray,
) -> jnp.ndarray:
    """View-dependent RGB from SH features (reference `__init__.py:76-81`).

    Args:
        sh_degree: active SH degree (static).
        features: [N, K, 3] SH coefficients, coefficient-major.
        means3d: [N, 3] Gaussian centers.
        camera_center: [3] camera position.

    Returns:
        [N, 3] colors, ``max(eval_sh + 0.5, 0)``.
    """
    dirs = means3d - camera_center[None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # eval_sh consumes channel-major [..., C, K].
    sh = jnp.swapaxes(features, -1, -2)
    rgb = eval_sh(sh_degree, sh, dirs)
    return jnp.maximum(rgb + 0.5, 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "scaling_modifier", "rasterizer", "instance_cap"
    ),
)
def render(
    means3d: jnp.ndarray,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    camera: Camera,
    background: jnp.ndarray,
    sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    mean2d_tap: jnp.ndarray | None = None,
    override_colors: jnp.ndarray | None = None,
    rasterizer: str = "reference",
    instance_cap: int | None = None,
) -> RenderOutput:
    """Render one view with the reference-path rasterizer.

    Args:
        means3d: [N, 3] centers.
        features: [N, K, 3] SH coefficients ((K = (max_deg+1)²)).
        opacities: [N] activated opacities.
        scales: [N, 3] activated scales.
        rotations: [N, 4] quaternions.
        camera: single camera.
        background: [3] background color.
        sh_degree: active SH degree (static).
        scaling_modifier: global scale multiplier (static).
        mean2d_tap: optional [N, 2] zeros; gradients w.r.t. it are the
            screen-space mean gradients used for densification.
        override_colors: optional [N, 3] RGB bypassing SH evaluation
            (the reference's `override_color`, used by depth rendering).
        rasterizer: "reference" (slow jnp oracle) or "tiled" (Pallas
            production path).
        instance_cap: static (tile, gaussian) instance budget for the tiled
            rasterizer; None picks a heuristic.  The training loop grows it
            (re-jit) when `ops.binning.count_instances` outgrows the cap.
    """
    rgb, logt, proj = _render_partials_impl(
        means3d, features, opacities, scales, rotations, camera,
        sh_degree, scaling_modifier, mean2d_tap, override_colors,
        rasterizer, instance_cap,
    )
    image = rgb + jnp.exp(logt)[:, :, None] * background[None, None, :]
    return RenderOutput(image=image, radii=proj.radius, visibility=proj.valid)


def render_partials(
    means3d: jnp.ndarray,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    camera: Camera,
    sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    mean2d_tap: jnp.ndarray | None = None,
    override_colors: jnp.ndarray | None = None,
    rasterizer: str = "tiled",
    instance_cap: int | None = None,
) -> RenderPartials:
    """Render one view into pre-background (rgb, log T) partials.

    The Gaussian-sharded path (``parallel/sharded_train.py``): each shard
    renders only its own Gaussians with this function, then shards merge in
    depth order via ``parallel.compose.merge_depth_partials``.  Not jitted
    here — it is called inside the shard_map'd train step.
    """
    rgb, logt, proj = _render_partials_impl(
        means3d, features, opacities, scales, rotations, camera,
        sh_degree, scaling_modifier, mean2d_tap, override_colors,
        rasterizer, instance_cap,
    )
    return RenderPartials(
        rgb=rgb, logt=logt, radii=proj.radius, visibility=proj.valid,
        depth=proj.depth,
    )


def _render_partials_impl(
    means3d, features, opacities, scales, rotations, camera,
    sh_degree, scaling_modifier, mean2d_tap, override_colors,
    rasterizer, instance_cap,
):
    proj = project_gaussians(
        means3d,
        scales,
        rotations,
        camera,
        scaling_modifier=scaling_modifier,
        opacities=opacities,
    )
    if mean2d_tap is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_tap)
    if override_colors is None:
        colors = gaussian_colors(sh_degree, features, means3d, camera.camera_center)
    else:
        colors = override_colors
    if rasterizer == "tiled":
        from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled_partials

        rgb, logt = rasterize_tiled_partials(
            proj, colors, opacities, camera.width, camera.height,
            instance_cap=instance_cap,
        )
    else:
        from event3dgs_tpu.ops.rasterize_reference import (
            rasterize_reference_partials,
        )

        rgb, logt = rasterize_reference_partials(
            proj, colors, opacities, camera.width, camera.height
        )
    return rgb, logt, proj


def render_depth(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    camera: Camera,
    background: jnp.ndarray,
) -> RenderOutput:
    """Alpha-composited camera-distance map (reference `render_depth`,
    `gaussian_renderer/__init__.py:106-189`): colors are replaced by
    ``‖xyz − campos‖ + 0.5`` on all three channels."""
    dist = jnp.linalg.norm(
        means3d - camera.camera_center[None, :], axis=-1, keepdims=True
    )
    colors = jnp.maximum(dist + 0.5, 0.0) * jnp.ones((1, 3))
    dummy_features = jnp.zeros((means3d.shape[0], 1, 3))
    return render(
        means3d,
        dummy_features,
        opacities,
        scales,
        rotations,
        camera,
        background,
        sh_degree=0,
        override_colors=colors,
    )
