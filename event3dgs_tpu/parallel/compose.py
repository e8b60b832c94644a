"""Cross-shard depth-ordered compositing of (rgb, log T) render partials.

The reference rasterizer composites all Gaussians on one GPU in one global
depth order (`/root/reference/gaussian_renderer/__init__.py:38-97`).  The
TPU-native scaling design shards the Gaussian storage over the ``gauss``
mesh axis and has each shard composite *only its own* Gaussians into
pre-background partials (``ops.render.render_partials``).  Because the
rasterizer's carry is (accumulated rgb, log transmittance), the over-operator
is associative across depth-ordered segments:

    rgb   = Σ_k exp(Σ_{j<k} logT_j) · rgb_k
    logT  = Σ_k logT_k
    image = rgb + exp(logT) · background

which is exact when shard k's Gaussians are all in front of shard k+1's
along every camera ray.  ``parallel.partition.repartition_by_depth`` keeps
the shard assignment depth-ordered (by a per-scene depth proxy, refreshed at
densification time), so the merge is exact up to the (rare) cross-shard pairs
that straddle a quantile boundary — the same order-approximation class as
the reference's own center-depth sort.

Communication: one all-gather of the [H, W] log-transmittance maps (for the
exclusive prefix) plus one psum of the weighted [H, W, 3] rgb partials — both
ride the ``gauss`` axis of the ICI mesh.  Per-device memory is
O(N/K params + K·H·W), never O(N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_depth_partials(
    rgb: jnp.ndarray,  # [H, W, 3] this shard's accumulated color
    logt: jnp.ndarray,  # [H, W] this shard's log transmittance
    background: jnp.ndarray,  # [3]
    axis_name: str,
    axis_size: int,
) -> jnp.ndarray:
    """Merge per-shard partials over ``axis_name`` into the full image.

    Must be called inside ``shard_map`` with shard index along
    ``axis_name`` equal to the shard's depth rank (front = 0).  Gradients
    flow correctly to every shard's partials, including through other
    shards' transmittance prefixes (verified against the unsharded
    compositor in ``tests/test_parallel.py``).
    """
    # no size-1 shortcut: the psums also mark the merged image *invariant*
    # over the gauss axis in shard_map's vma tracking (required for the
    # replicated out_specs of everything derived from the loss), and they
    # compile to no-ops on a size-1 axis.
    # [K, H, W] every shard's logT; needed for the exclusive prefix
    ag = jax.lax.all_gather(logt, axis_name)
    k = jax.lax.axis_index(axis_name)
    in_front = (
        jnp.arange(axis_size) < k
    ).astype(ag.dtype)[:, None, None]
    prefix = jnp.sum(ag * in_front, axis=0)  # [H, W] logT of nearer shards
    weighted = jnp.exp(prefix)[:, :, None] * rgb
    total_rgb = jax.lax.psum(weighted, axis_name)
    total_logt = jax.lax.psum(logt, axis_name)
    return total_rgb + jnp.exp(total_logt)[:, :, None] * background[None, None, :]
