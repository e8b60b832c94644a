"""Depth-quantile Gaussian partitioning for the ``gauss`` mesh axis
(partials compositing strategy only).

The partials compositor (``parallel.compose.merge_depth_partials``) is exact
only when the shards are depth-separable per view.  This module reorders the
capacity dimension of the whole train state so shard k (slot range
[k·C/K, (k+1)·C/K)) holds the k-th depth quantile of the alive Gaussians by
a *scene-static* proxy: distance from the camera-position centroid
(`/root/reference/scene/dataset_readers.py:47-68` computes the same centroid
for the nerf++ radius).

**Known limits, measured.**  The proxy orders shards correctly for
forward-facing and layered rigs (narrow-arc captures), where the quantile
shards are genuinely depth-separated per view.  On inward-facing rigs (full
orbits — `tools/make_scene.py` default ``arc=2π`` and every inward real
dataset) the rig centroid sits at the scene center, so the proxy is
radius-from-center: shards are concentric shells that every view ray crosses
twice (near side, far side), and *no* shard ordering — static or per-view —
composites them exactly.  ``parallel.compose.view_depth_ranks`` repairs the
*order* per view (shells rank by mean visible depth), which removes the
systematic inside-out inversion, but cross-shard pairs with overlapping
footprints still interleave; measured max pixel error on a 48-Gaussian
arc=2π scene is ~1e-2 (see ``tests/test_parallel.py::TestOrbitSharding``).
For exact sharded rendering on orbit geometry use the default
projected-splat exchange path (``parallel.exchange``), which does not need
this partition at all.

Runs host-side at init and at densification boundaries (densify already
syncs the host); a permutation of the capacity dim relabels Gaussian slots,
which is semantics-free for rendering and optimization (both are per-slot).
Dead slots are spread uniformly across shards so each shard retains free
capacity for densification growth.
"""

from __future__ import annotations

import jax
import numpy as np

from event3dgs_tpu.core.camera import Camera


def depth_proxy(xyz: np.ndarray, cameras: Camera) -> np.ndarray:
    """[C] per-Gaussian scene-static depth proxy (rig-centroid distance)."""
    centers = np.asarray(cameras.camera_center)
    centroid = centers.reshape(-1, 3).mean(axis=0)
    return np.linalg.norm(np.asarray(xyz) - centroid[None, :], axis=1)


def depth_partition_perm(
    xyz: np.ndarray,
    alive: np.ndarray,
    cameras: Camera,
    n_shards: int,
) -> np.ndarray:
    """Permutation ``perm`` with ``new_leaf = leaf[perm]`` laying out slots
    so shard k holds the k-th depth quantile of the alive Gaussians.

    Alive Gaussians are sorted by the depth proxy and dealt into shards in
    contiguous quantile blocks; dead slots are appended round-robin so every
    shard keeps ~equal free capacity.
    """
    c = xyz.shape[0]
    if c % n_shards:
        raise ValueError(f"capacity {c} not divisible by {n_shards} shards")
    per = c // n_shards
    alive = np.asarray(alive, bool)
    alive_idx = np.flatnonzero(alive)
    dead_idx = np.flatnonzero(~alive)
    proxy = depth_proxy(xyz, cameras)
    alive_sorted = alive_idx[np.argsort(proxy[alive_idx], kind="stable")]

    # quantile split of the alive list into n_shards near-equal groups
    bounds = np.linspace(0, alive_sorted.size, n_shards + 1).round().astype(int)
    perm = np.empty(c, np.int64)
    d = 0  # next dead slot to hand out
    for k in range(n_shards):
        grp = alive_sorted[bounds[k] : bounds[k + 1]]
        if grp.size > per:
            raise ValueError(
                f"shard {k} quantile ({grp.size}) exceeds shard capacity {per}"
            )
        n_dead = per - grp.size
        fill = dead_idx[d : d + n_dead]
        d += n_dead
        perm[k * per : (k + 1) * per] = np.concatenate([grp, fill])
    return perm


def permute_capacity_dim(tree, perm: np.ndarray, capacity: int):
    """Apply a slot permutation to every [C, ...] leaf of a pytree."""
    perm = jax.numpy.asarray(perm)

    def apply(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return leaf[perm]
        return leaf

    return jax.tree.map(apply, tree)


def repartition_by_depth(state, cameras: Camera, n_shards: int):
    """Reorder a TrainState's Gaussian slots into depth-quantile shard order.

    Returns the permuted state (params + Adam moments + densify stats all
    permuted consistently).  Call on an unsharded (host/replicated) state;
    re-place onto the mesh afterwards (``shard_train_state``).
    """
    xyz = np.asarray(jax.device_get(state.params.xyz))
    alive = np.asarray(jax.device_get(state.params.alive))
    perm = depth_partition_perm(xyz, alive, cameras, n_shards)
    return permute_capacity_dim(state, perm, state.params.capacity)
