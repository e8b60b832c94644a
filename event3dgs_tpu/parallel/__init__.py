"""Multi-chip scaling: device meshes, sharding rules, sharded train steps.

The reference is strictly single-GPU (SURVEY §2.4) — everything here is new
TPU-native design:

- mesh axes ``("data", "gauss")``: views/event-pairs shard over ``data``,
  Gaussian storage (parameters + optimizer state + densify stats) shards
  over ``gauss``;
- the train step runs under ``shard_map``: each gauss shard rasterizes only
  its own Gaussians into (rgb, log T) partials with the tiled Pallas
  rasterizer, shards merge in depth order (``compose``), and gradients
  psum across ``data`` — per-device memory is O(N/shards), never O(N);
- ``partition`` keeps the shard assignment depth-ordered (refreshed at
  densification time) so the cross-shard merge is exact;
- ``distributed`` bootstraps multi-host meshes via
  ``jax.distributed.initialize``.
"""

from event3dgs_tpu.parallel.compose import merge_depth_partials
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
    "repartition_by_depth",
    "shard_train_state",
    "state_partition_specs",
    "unshard_state",
]
