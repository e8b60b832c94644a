"""Loss library: L1/SSIM (+gray), event simulation loss, composed mode losses."""

from event3dgs_tpu.losses.basic import (
    l1_loss,
    l2_loss,
    psnr,
    mse,
    rgb_to_grayscale,
    rgb_to_luv_l,
    l1_loss_gray,
    ssim,
    ssim_gray,
)
from event3dgs_tpu.losses.event import (
    event_log_diff,
    event_mixture_loss,
    thresholded_event_l1,
    dice_loss,
    cross_entropy_event_loss,
    quadratic_tolerance_loss,
    pointcloud_nn_loss,
    chamfer_event_loss,
)
from event3dgs_tpu.losses.modes import (
    rgb_total_loss,
    gray_total_loss,
    event_total_loss,
    deblur_mix,
)

__all__ = [
    "l1_loss",
    "l2_loss",
    "psnr",
    "mse",
    "rgb_to_grayscale",
    "rgb_to_luv_l",
    "l1_loss_gray",
    "ssim",
    "ssim_gray",
    "event_log_diff",
    "event_mixture_loss",
    "thresholded_event_l1",
    "dice_loss",
    "cross_entropy_event_loss",
    "quadratic_tolerance_loss",
    "pointcloud_nn_loss",
    "chamfer_event_loss",
    "rgb_total_loss",
    "gray_total_loss",
    "event_total_loss",
    "deblur_mix",
]
