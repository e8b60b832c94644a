"""Pure math: camera transforms, projection, spherical harmonics, schedules."""

from event3dgs_tpu.core.transforms import (
    world_to_view,
    perspective_projection,
    fov2focal,
    focal2fov,
    quat_to_rotmat,
    build_covariance,
    covariance_to_symm6,
    inverse_sigmoid,
)
from event3dgs_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, SH_C0
from event3dgs_tpu.core.schedules import exponential_lr
from event3dgs_tpu.core.camera import Camera, make_camera, CameraBatch, stack_cameras

__all__ = [
    "world_to_view",
    "perspective_projection",
    "fov2focal",
    "focal2fov",
    "quat_to_rotmat",
    "build_covariance",
    "covariance_to_symm6",
    "inverse_sigmoid",
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "SH_C0",
    "exponential_lr",
    "Camera",
    "make_camera",
    "CameraBatch",
    "stack_cameras",
]
