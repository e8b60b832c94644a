"""Gaussian model: fixed-capacity parameter pytrees, optimizer, densification."""

from event3dgs_tpu.models.gaussians import (
    GaussianParams,
    init_from_point_cloud,
    activated,
    num_alive,
)
from event3dgs_tpu.models.optimizer import AdamState, adam_init, adam_update
from event3dgs_tpu.models.densify import (
    DensifyStats,
    init_stats,
    update_stats,
    densify_and_prune,
    reset_opacity,
)

__all__ = [
    "GaussianParams",
    "init_from_point_cloud",
    "activated",
    "num_alive",
    "AdamState",
    "adam_init",
    "adam_update",
    "DensifyStats",
    "init_stats",
    "update_stats",
    "densify_and_prune",
    "reset_opacity",
]
