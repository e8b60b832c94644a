"""Utilities: configuration, image IO, logging."""

from event3dgs_tpu.utils.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    EventConfig,
    TrainConfig,
)

__all__ = [
    "ModelConfig",
    "OptimizationConfig",
    "PipelineConfig",
    "EventConfig",
    "TrainConfig",
]
