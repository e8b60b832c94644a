"""Reference (slow) rasterizer: depth-sorted alpha compositing in pure jnp.

The correctness oracle for the production tiled kernels.  No tiling, no
binning: Gaussians are globally sorted by depth and composited front-to-back
over *all* pixels in chunks along the Gaussian axis, with JAX autodiff
providing exact gradients.  Numerics follow the upstream 3DGS kernel
conventions documented in SURVEY §2.3:

- per-pixel weight ``α = min(0.99, opacity · exp(power))`` with
  ``power = -½(a·dx² + c·dy²) - b·dx·dy`` from the conic;
- contributions with ``power > 0`` or ``α < 1/255`` are skipped;
- compositing stops (per pixel) once transmittance would drop below 1e-4 —
  the triggering Gaussian is *not* composited;
- the background is blended with the final transmittance;
- a Gaussian only touches pixels whose tile lies inside its 3σ tile-rect
  (the tile-binned kernels — CUDA's and ours — share this support cutoff,
  so the oracle replicates it for bitwise-comparable semantics).

Runs fine on CPU for test-sized scenes; not intended for production use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from event3dgs_tpu.ops.binning import TILE_H, TILE_W
from event3dgs_tpu.ops.projection import ProjectedGaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def rasterize_reference(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    background: jnp.ndarray,
    width: int,
    height: int,
    chunk: int = 256,
) -> jnp.ndarray:
    """Composite projected Gaussians into an image.

    Args:
        proj: projected Gaussians (see :func:`project_gaussians`).
        colors: [N, 3] per-Gaussian RGB (already SH-evaluated and clamped).
        opacities: [N] activated opacities in [0, 1].
        background: [3] background color.
        width, height: static image dims.
        chunk: Gaussian-axis chunk size for the compositing scan.

    Returns:
        [height, width, 3] image.
    """
    rgb, t = _composite_all(proj, colors, opacities, width, height, chunk)
    rgb = rgb + t[:, None] * background[None, :]
    return rgb.reshape(height, width, 3)


def rasterize_reference_partials(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-background compositing partials: ([H, W, 3] rgb, [H, W] log T).

    For Gaussian-sharded rendering (``parallel/``): each shard composites
    only its own Gaussians; depth-ordered shards then merge exactly with
    ``rgb = Σ_k exp(Σ_{j<k} logT_j) · rgb_k`` and ``logT = Σ_k logT_k``
    (the over-operator is associative given the (rgb, log T) carry).
    """
    rgb, t = _composite_all(proj, colors, opacities, width, height, chunk)
    logt = jnp.log(jnp.maximum(t, 1e-30))
    return rgb.reshape(height, width, 3), logt.reshape(height, width)


def _composite_all(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-sort + composite: ([P, 3] rgb, [P] transmittance), P = H·W."""
    n = proj.mean2d.shape[0]
    n_pad = (-n) % chunk
    total = n + n_pad

    order = jnp.argsort(proj.depth)  # +inf depths (culled) sort last
    mean2d = jnp.pad(proj.mean2d[order], ((0, n_pad), (0, 0)))
    conic = jnp.pad(proj.conic[order], ((0, n_pad), (0, 0)))
    valid = jnp.pad(proj.valid[order], (0, n_pad))
    col = jnp.pad(colors[order], ((0, n_pad), (0, 0)))
    opa = jnp.pad(opacities[order], (0, n_pad)) * valid
    radius = jnp.pad(proj.radius[order], (0, n_pad))

    px = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1, W]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]  # [H, 1]
    npix = height * width
    pxf = jnp.broadcast_to(px, (height, width)).reshape(npix)
    pyf = jnp.broadcast_to(py, (height, width)).reshape(npix)
    # each pixel's tile coordinates, for the tile-rect support cutoff
    ptx = jnp.floor(pxf / TILE_W)
    pty = jnp.floor(pyf / TILE_H)

    def composite_chunk(carry, xs):
        rgb, T = carry  # [P, 3], [P]
        m2d, con, c_rgb, c_opa, rad = xs
        dx = m2d[None, :, 0] - pxf[:, None]  # [P, K]
        dy = m2d[None, :, 1] - pyf[:, None]
        # tile-rect support: pixel's tile must be in [floor((m-r)/T),
        # floor((m+r+T-1)/T)) — matching ops/binning.py getRect semantics
        in_rect = (
            (ptx[:, None] >= jnp.floor((m2d[None, :, 0] - rad[None, :]) / TILE_W))
            & (ptx[:, None] < jnp.floor((m2d[None, :, 0] + rad[None, :] + TILE_W - 1) / TILE_W))
            & (pty[:, None] >= jnp.floor((m2d[None, :, 1] - rad[None, :]) / TILE_H))
            & (pty[:, None] < jnp.floor((m2d[None, :, 1] + rad[None, :] + TILE_H - 1) / TILE_H))
        )
        power = (
            -0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy)
            - con[None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, c_opa[None, :] * jnp.exp(power))
        alpha = jnp.where(
            (power > 0.0) | (alpha < ALPHA_MIN) | ~in_rect, 0.0, alpha
        )

        # Early-stop semantics: the Gaussian that would push T below T_EPS
        # and everything behind it are dropped (discrete decision — no
        # gradient through the mask, same as the CUDA kernel).
        one_minus = 1.0 - alpha
        T_incl = T[:, None] * jnp.cumprod(one_minus, axis=1)
        stopped = jax.lax.stop_gradient(
            jnp.cumsum((T_incl < T_EPS).astype(alpha.dtype), axis=1) > 0
        )
        alpha = jnp.where(stopped, 0.0, alpha)

        one_minus = 1.0 - alpha
        # Exclusive transmittance inside the chunk.
        T_excl = jnp.concatenate(
            [jnp.ones_like(T)[:, None], jnp.cumprod(one_minus[:, :-1], axis=1)],
            axis=1,
        )
        w = alpha * T[:, None] * T_excl  # [P, K]
        rgb = rgb + jnp.matmul(w, c_rgb, precision=jax.lax.Precision.HIGHEST)
        T = T * jnp.prod(one_minus, axis=1)
        return (rgb, T), None

    # inside shard_map the xs carry device-varying vma; the scan carry must
    # match the body output's vma, so promote the (invariant) zeros/ones
    # init to the inputs' union (no-op outside shard_map)
    from event3dgs_tpu.ops.pallas_util import unify_vma

    init_rgb, init_t, _ = unify_vma(
        jnp.zeros((npix, 3)), jnp.ones((npix,)), mean2d
    )
    init = (init_rgb, init_t)
    xs = (
        mean2d.reshape(total // chunk, chunk, 2),
        conic.reshape(total // chunk, chunk, 3),
        col.reshape(total // chunk, chunk, 3),
        opa.reshape(total // chunk, chunk),
        radius.reshape(total // chunk, chunk),
    )
    # remat per chunk: without it the scan saves every step's [P, chunk]
    # intermediates for backward — hundreds of GB at 400×400 with a few
    # thousand Gaussians.  Recomputing the chunk in the bwd pass keeps the
    # oracle's gradient memory at O(P·chunk).
    (rgb, T), _ = jax.lax.scan(jax.checkpoint(composite_chunk), init, xs)
    return rgb, T
