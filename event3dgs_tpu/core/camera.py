"""Camera containers: pytree dataclasses with static image dimensions.

The reference precomputes per-camera matrices on construction
(`scene/cameras.py:17-57`); here a :class:`Camera` is an immutable pytree so
whole camera *batches* can be passed into jitted/sharded render functions.
Image width/height are static (non-pytree) fields because they determine
output shapes and the rasterizer grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from event3dgs_tpu.core.transforms import perspective_projection, world_to_view


@struct.dataclass
class Camera:
    """A single camera (or a batch, with leading dims on the array fields).

    Array fields follow the reference's row-vector convention:
    ``p_hom @ world_view`` maps world → camera, ``p_hom @ full_proj`` maps
    world → clip (reference `scene/cameras.py:54-57`).
    """

    world_view: jnp.ndarray  # [..., 4, 4]
    full_proj: jnp.ndarray  # [..., 4, 4]
    camera_center: jnp.ndarray  # [..., 3]
    tan_fovx: jnp.ndarray  # [...]
    tan_fovy: jnp.ndarray  # [...]
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @property
    def batch_shape(self):
        return self.camera_center.shape[:-1]

    def __getitem__(self, idx):
        """Index/slice a camera batch (array fields only)."""
        return Camera(
            world_view=self.world_view[idx],
            full_proj=self.full_proj[idx],
            camera_center=self.camera_center[idx],
            tan_fovx=self.tan_fovx[idx],
            tan_fovy=self.tan_fovy[idx],
            width=self.width,
            height=self.height,
            znear=self.znear,
            zfar=self.zfar,
        )


# Alias: a Camera whose array fields carry a leading batch dimension.
CameraBatch = Camera


def make_camera(
    R,
    t,
    fov_x: float,
    fov_y: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    translate=None,
    scale: float = 1.0,
) -> Camera:
    """Build a camera from COLMAP-style extrinsics and FoVs.

    Mirrors the reference camera precompute (`scene/cameras.py:48-57`): the
    projection matrix z-range is [znear=0.01, zfar=100], ``full_proj`` is the
    row-vector product W2C·P, and ``camera_center`` is the last row of the
    inverted (transposed) view matrix.
    """
    wv = world_to_view(R, t, translate=translate, scale=scale)
    proj = perspective_projection(znear, zfar, fov_x, fov_y)
    # Full f32 precision: on TPU the default matmul path drops to bf16
    # passes, which is far too coarse for chained camera matrices.
    full = jnp.matmul(wv, proj, precision=jax.lax.Precision.HIGHEST)
    center = jnp.linalg.inv(wv)[..., 3, :3]
    return Camera(
        world_view=wv,
        full_proj=full,
        camera_center=center,
        tan_fovx=jnp.asarray(np.tan(fov_x / 2.0), jnp.float32),
        tan_fovy=jnp.asarray(np.tan(fov_y / 2.0), jnp.float32),
        width=int(width),
        height=int(height),
        znear=float(znear),
        zfar=float(zfar),
    )


def stack_cameras(cams) -> Camera:
    """Stack a list of same-resolution cameras into a batched Camera pytree."""
    if not cams:
        raise ValueError("cannot stack an empty camera list")
    w, h = cams[0].width, cams[0].height
    for c in cams:
        if (c.width, c.height) != (w, h):
            raise ValueError("all cameras in a batch must share resolution")
    return Camera(
        world_view=jnp.stack([c.world_view for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        camera_center=jnp.stack([c.camera_center for c in cams]),
        tan_fovx=jnp.stack([c.tan_fovx for c in cams]),
        tan_fovy=jnp.stack([c.tan_fovy for c in cams]),
        width=w,
        height=h,
        znear=cams[0].znear,
        zfar=cams[0].zfar,
    )
