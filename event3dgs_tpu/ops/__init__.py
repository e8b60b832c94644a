"""Differentiable 3D Gaussian splatting ops.

- ``projection``: frustum cull + EWA 3D→2D covariance projection (preprocess)
- ``rasterize_reference``: slow pure-jnp depth-sorted compositing oracle
- ``rasterize_tiled``: production tile-binned rasterizer (XLA + Pallas)
- ``render``: high-level camera+model → image entry points
"""

from event3dgs_tpu.ops.projection import ProjectedGaussians, project_gaussians
from event3dgs_tpu.ops.rasterize_reference import rasterize_reference
from event3dgs_tpu.ops.render import (
    render,
    render_depth,
    render_partials,
    RenderOutput,
    RenderPartials,
)

__all__ = [
    "ProjectedGaussians",
    "project_gaussians",
    "rasterize_reference",
    "render",
    "render_depth",
    "render_partials",
    "RenderOutput",
    "RenderPartials",
]
