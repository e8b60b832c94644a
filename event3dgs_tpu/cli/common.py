"""Shared CLI plumbing: argument parsing and scene/state assembly."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax.numpy as jnp

from event3dgs_tpu.data.scene import (
    build_camera_batch,
    camera_to_json,
    detect_scene_type,
    load_images_array,
    read_blender_scene,
    read_colmap_scene,
)
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.train.state import SceneData, init_train_state
from event3dgs_tpu.utils.config import (
    EventConfig,
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    TrainConfig,
)


def add_model_args(p: argparse.ArgumentParser):
    """Reference `ModelParams` flags (`arguments/__init__.py:47-61`)."""
    p.add_argument("--source_path", "-s", type=str, default="")
    p.add_argument("--model_path", "-m", type=str, default="")
    p.add_argument("--images", "-i", type=str, default="images")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--gray", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--event", action="store_true")
    p.add_argument("--deblur", action="store_true")
    p.add_argument("--capacity", type=int, default=0)


def add_pipeline_args(p: argparse.ArgumentParser):
    p.add_argument("--convert_SHs_python", action="store_true")
    p.add_argument("--compute_cov3D_python", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument(
        "--rasterizer", type=str, default="tiled", choices=["tiled", "reference"]
    )
    p.add_argument(
        "--gauss_mode", type=str, default="exact",
        choices=["exact", "partials"],
        help="gauss-axis compositing strategy: exact per-view splat "
             "exchange (default) or approximate image-partials merge",
    )
    p.add_argument(
        "--fused_steps", type=int, default=1,
        help="fuse up to N train steps per device dispatch (lax.scan) "
             "between host events; 1 = per-step dispatch",
    )


def add_optimization_args(p: argparse.ArgumentParser):
    """Reference `OptimizationParams` flags (`arguments/__init__.py:75-94`)."""
    d = OptimizationConfig()
    for f in (
        "iterations position_lr_init position_lr_final position_lr_delay_mult "
        "position_lr_max_steps feature_lr opacity_lr scaling_lr rotation_lr "
        "percent_dense lambda_dssim densification_interval "
        "opacity_reset_interval densify_from_iter densify_until_iter "
        "densify_grad_threshold"
    ).split():
        default = getattr(d, f)
        p.add_argument(f"--{f}", type=type(default), default=default)
    p.add_argument("--random_background", action="store_true")


def add_event_args(p: argparse.ArgumentParser):
    """Event-mode knobs the reference hardcodes (surfaced per SURVEY §5)."""
    d = EventConfig()
    for f in (
        "contrast_init contrast_lr gt_contrast event_weight blur_alpha "
        "event_lambda_dssim"
    ).split():
        p.add_argument(f"--{f}", type=float, default=getattr(d, f))
    p.add_argument(
        "--event_opacity_reset_interval", type=int,
        default=d.opacity_reset_interval,
    )
    p.add_argument(
        "--contrast_parameterization", choices=("identity", "softplus"),
        default=d.contrast_parameterization,
        help="'identity' = the reference's unconstrained c (faithful "
             "default); 'softplus' = opt-in positivity guard (deviation) "
             "preventing the event term from self-amputating via c<0",
    )


def config_from_args(args) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            sh_degree=args.sh_degree,
            source_path=os.path.abspath(args.source_path) if args.source_path else "",
            model_path=args.model_path,
            images=args.images,
            resolution=args.resolution,
            white_background=args.white_background,
            eval=args.eval,
            gray=args.gray,
            random=args.random,
            event=args.event,
            deblur=args.deblur,
            capacity=args.capacity,
        ),
        pipeline=PipelineConfig(
            rasterizer=getattr(args, "rasterizer", "tiled"),
            gauss_mode=getattr(args, "gauss_mode", "exact"),
            fused_steps=getattr(args, "fused_steps", 1),
        ),
        optimization=OptimizationConfig(
            **{
                f: getattr(args, f)
                for f in OptimizationConfig.__dataclass_fields__
                if hasattr(args, f)
            }
        ),
        event=EventConfig(
            contrast_init=getattr(args, "contrast_init", 0.17),
            contrast_lr=getattr(args, "contrast_lr", 0.1),
            gt_contrast=getattr(args, "gt_contrast", 0.17),
            event_weight=getattr(args, "event_weight", 0.9),
            blur_alpha=getattr(args, "blur_alpha", 0.5),
            event_lambda_dssim=getattr(args, "event_lambda_dssim", 0.0),
            opacity_reset_interval=getattr(
                args, "event_opacity_reset_interval", 10_000
            ),
            contrast_parameterization=getattr(
                args, "contrast_parameterization", "identity"
            ),
        ),
    )


def mode_from_config(cfg: TrainConfig) -> str:
    m = cfg.model
    if m.event and m.deblur:
        return "event_deblur"
    if m.event:
        return "event"
    if m.gray:
        return "gray"
    return "rgb"


def load_scene_and_state(cfg: TrainConfig):
    """Scene dir → (SceneInfo, SceneData, TrainState, extent)."""
    m = cfg.model
    kind = detect_scene_type(m.source_path)
    if kind == "colmap":
        info = read_colmap_scene(
            m.source_path, images_dir=m.images, gray=m.gray,
            deblur=m.deblur, event=m.event,
        )
    else:
        info = read_blender_scene(m.source_path, m.white_background)

    cameras = build_camera_batch(info.train_cameras, m.resolution)
    images = jnp.asarray(
        load_images_array(info.train_cameras, m.resolution, m.white_background)
    )
    event_cameras = event_images = blurry_images = None
    if info.event_cameras:
        event_cameras = build_camera_batch(info.event_cameras, m.resolution)
        event_images = jnp.asarray(
            load_images_array(info.event_cameras, m.resolution, m.white_background)
        )
    if info.blurry_cameras:
        blurry_images = jnp.asarray(
            load_images_array(info.blurry_cameras, m.resolution, m.white_background)
        )
    test_cameras = test_images = None
    if info.test_cameras:
        test_cameras = build_camera_batch(info.test_cameras, m.resolution)
        test_images = jnp.asarray(
            load_images_array(info.test_cameras, m.resolution, m.white_background)
        )

    data = SceneData(
        cameras=cameras,
        images=images,
        event_cameras=event_cameras,
        event_images=event_images,
        blurry_images=blurry_images,
        test_cameras=test_cameras,
        test_images=test_images,
    )

    pcd = info.point_cloud
    n_pts = len(pcd.points)
    capacity = m.capacity or max(1 << max(n_pts * 4 - 1, 1).bit_length(), 1 << 14)
    params = init_from_point_cloud(
        np.asarray(pcd.points), np.asarray(pcd.colors), capacity,
        max_sh_degree=m.sh_degree,
    )
    from event3dgs_tpu.losses.event import raw_contrast_init

    state = init_train_state(
        params, spatial_lr_scale=info.radius,
        contrast_init=raw_contrast_init(
            cfg.event.contrast_init, cfg.event.contrast_parameterization
        ),
        max_sh_degree=m.sh_degree,
    )
    return info, data, state, info.radius


def prepare_output_dir(cfg: TrainConfig, info) -> str:
    """Create the model dir, dump cfg.json + cameras.json + input.ply
    (reference `prepare_output_and_logger` + `Scene.__init__`,
    `train.py:338-358`, `scene/__init__.py:40-50`)."""
    import shutil
    import uuid

    model_path = cfg.model.model_path or os.path.join(
        "./output", str(uuid.uuid4())[:10]
    )
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(model_path, "cameras.json"), "w") as f:
        json.dump(
            [camera_to_json(i, c) for i, c in enumerate(info.train_cameras)], f
        )
    if info.ply_path and os.path.exists(info.ply_path):
        shutil.copyfile(info.ply_path, os.path.join(model_path, "input.ply"))
    return model_path


def claim_accelerator() -> None:
    """Touch the accelerator before long host-side work (dataset loads).

    Remote-attached TPU runtimes (tunneled single-chip dev environments)
    can drop a freshly initialized backend whose first real device op
    arrives minutes after startup; a no-op claim is free locally.
    """
    float(jnp.zeros((1,)).sum())


def load_run_config(model_path: str) -> TrainConfig:
    """Re-load a run's persisted config (replaces the reference's
    `get_combined_args` eval() of cfg_args)."""
    with open(os.path.join(model_path, "cfg.json")) as f:
        return TrainConfig.from_json(f.read())
