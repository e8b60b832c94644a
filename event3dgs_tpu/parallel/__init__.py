"""Multi-chip scaling: device meshes, sharding rules, sharded train steps.

The reference is strictly single-GPU (SURVEY §2.4) — everything here is new
TPU-native design:

- mesh axes ``("data", "gauss")``: views/event-pairs shard over ``data``,
  Gaussian storage (parameters + optimizer state + densify stats) shards
  over ``gauss``;
- rendering all-gathers the (much smaller) *projected* per-Gaussian
  attributes, not the raw parameters, and the compiler turns the gather's
  transpose into the gradient reduce-scatter;
- gradients across the ``data`` axis are psum'd by GSPMD from the sharding
  annotations — no hand-written collectives in the train step.
"""

from event3dgs_tpu.parallel.mesh import make_mesh, data_sharding, gauss_sharding
from event3dgs_tpu.parallel.sharded_train import (
    make_sharded_train_step,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "gauss_sharding",
    "make_sharded_train_step",
    "shard_train_state",
]
