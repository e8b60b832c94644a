"""Dataset layer: PLY/COLMAP/Blender readers, camera lists, synthetic scenes."""

from event3dgs_tpu.data.ply import (
    read_ply,
    write_ply,
    fetch_point_cloud,
    store_point_cloud,
    save_gaussian_ply,
    load_gaussian_ply,
)

__all__ = [
    "read_ply",
    "write_ply",
    "fetch_point_cloud",
    "store_point_cloud",
    "save_gaussian_ply",
    "load_gaussian_ply",
]
