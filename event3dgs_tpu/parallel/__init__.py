"""Multi-chip scaling: device meshes, sharding rules, sharded train steps.

The reference is strictly single-GPU (SURVEY §2.4) — everything here is new
TPU-native design:

- mesh axes ``("data", "gauss")``: views/event-pairs shard over ``data``,
  Gaussian storage (parameters + optimizer state + densify stats) shards
  over ``gauss`` — per-device *state* is O(N/shards), never O(N);
- the train step runs under ``shard_map`` with two gauss-axis compositing
  strategies: ``exchange`` (default, exact) has shards swap per-view
  projected splats with one all_to_all so every device rasterizes the full
  set for its own view with the reference's global per-view depth sort;
  ``compose``/``partition`` (opt-in) has each shard rasterize only its own
  Gaussians into (rgb, log T) image partials merged in per-view shard rank
  order — cheaper collectives, approximate on non-depth-separable rigs;
- ``distributed`` bootstraps multi-host meshes via
  ``jax.distributed.initialize``.
"""

from event3dgs_tpu.parallel.compose import merge_depth_partials, view_depth_ranks
from event3dgs_tpu.parallel.exchange import render_view_exchange
from event3dgs_tpu.parallel.mesh import make_mesh, data_sharding, gauss_sharding
from event3dgs_tpu.parallel.partition import repartition_by_depth
from event3dgs_tpu.parallel.sharded_train import (
    make_sharded_train_step,
    shard_train_state,
    state_partition_specs,
    unshard_state,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "gauss_sharding",
    "make_sharded_train_step",
    "merge_depth_partials",
    "render_view_exchange",
    "repartition_by_depth",
    "shard_train_state",
    "state_partition_specs",
    "unshard_state",
    "view_depth_ranks",
]
