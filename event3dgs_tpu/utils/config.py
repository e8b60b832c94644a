"""Typed configuration replacing the reference's reflection-argparse groups.

Mirrors the three reference groups (`arguments/__init__.py:47-94`) with the
same defaults, plus an :class:`EventConfig` that surfaces every knob the
reference hardcodes inline (`train.py:71-72,119,170,177,187,201` — learnable
contrast init/LR, GT contrast, event weight, blur alpha, the event-mode
opacity-reset override).  Plain dataclasses: serializable to/from JSON —
no ``eval()`` of config files (the reference's `get_combined_args` evals
`cfg_args`, `arguments/__init__.py:110`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Reference `ModelParams` (`arguments/__init__.py:47-66`)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    gray: bool = False
    random: bool = False
    event: bool = False
    deblur: bool = False
    # TPU-build additions
    capacity: int = 0  # 0 → auto (next pow2 ≥ 4× init points)


@dataclass
class PipelineConfig:
    """Reference `PipelineParams` (`arguments/__init__.py:68-73`)."""

    convert_SHs_python: bool = True  # the reference force-enables this
    compute_cov3D_python: bool = False
    debug: bool = False
    # TPU-build addition: "reference" (slow oracle) or "tiled" (Pallas)
    rasterizer: str = "tiled"
    # TPU-build addition, gauss-axis compositing strategy (parallel/):
    # "exact" = per-view projected-splat exchange (exact on any geometry),
    # "partials" = per-shard image partials + rank-ordered merge
    # (approximate; cheaper comms when N >> K*H*W on forward-facing rigs)
    gauss_mode: str = "exact"
    # TPU-build addition: fuse up to this many train steps into one
    # lax.scan dispatch between host events (logging/densify/save
    # boundaries are never crossed).  Recovers the per-dispatch overhead
    # (~6 ms/step through the axon relay, PROFILE_r5.md §4) at the cost of
    # coarser live-metric/GUI latency.  1 = reference-faithful per-step
    # dispatch (default).
    fused_steps: int = 1


@dataclass
class OptimizationConfig:
    """Reference `OptimizationParams` (`arguments/__init__.py:75-94`)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


@dataclass
class EventConfig:
    """Event-mode knobs the reference hardcodes inline (see module doc)."""

    contrast_init: float = 0.17  # learnable c init (`train.py:71`)
    contrast_lr: float = 0.1  # its Adam LR (`train.py:72`)
    # "identity" is the reference's unconstrained c (`train.py:71-72`),
    # which can drift negative and silently kill the event term (observed
    # in deblur runs: c -> -5.9 scales the simulated event diff toward 0).
    # "softplus" is an opt-in DEVIATION: the optimized scalar is
    # unconstrained but the loss uses softplus(raw) > 0, so the event
    # signal cannot self-amputate.
    contrast_parameterization: str = "identity"  # or "softplus"
    gt_contrast: float = 0.17  # GT pair threshold (`train.py:170`)
    event_weight: float = 0.9  # event/intensity mix (`train.py:187`)
    blur_alpha: float = 0.5  # deblur mix (`train.py:201`)
    event_lambda_dssim: float = 0.0  # λ_dssim forced to 0 (`train.py:177`)
    opacity_reset_interval: int = 10_000  # event-mode override (`train.py:119`)


@dataclass
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    event: EventConfig = field(default_factory=EventConfig)
    test_iterations: tuple = ()
    save_iterations: tuple = ()
    checkpoint_iterations: tuple = ()
    seed: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        d = json.loads(text)

        def build(tp, sub):
            return tp(**{k: v for k, v in sub.items()
                         if k in {f.name for f in dataclasses.fields(tp)}})

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            pipeline=build(PipelineConfig, d.get("pipeline", {})),
            optimization=build(OptimizationConfig, d.get("optimization", {})),
            event=build(EventConfig, d.get("event", {})),
            test_iterations=tuple(d.get("test_iterations", ())),
            save_iterations=tuple(d.get("save_iterations", ())),
            checkpoint_iterations=tuple(d.get("checkpoint_iterations", ())),
            seed=d.get("seed", 0),
        )
