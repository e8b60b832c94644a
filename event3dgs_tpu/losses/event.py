"""Event-camera losses: the differentiable event simulation and variants.

The core of Event-3DGS training: two consecutively rendered views are turned
into a normalized log-intensity difference (the "event frame" a DVS camera
with contrast threshold C would integrate to) and compared against the same
quantity computed from event-derived ground-truth intensity pairs.  The
contrast threshold of the *rendered* pair is a learnable scalar optimized
jointly (reference `train.py:71-72,165-196`; loss formula
`utils/loss_utils.py:234-249`).
"""

from __future__ import annotations

import jax.numpy as jnp

from event3dgs_tpu.losses.basic import l1_loss, rgb_to_grayscale, rgb_to_luv_l

LOG_EPS = 1e-8  # epsilon inside the logs (`loss_utils.py:243`)


def event_log_diff(image, image_next, contrast) -> jnp.ndarray:
    """Normalized log-intensity difference between consecutive frames.

    ``(log(L(I₂)+ε) − log(L(I₁)+ε)) / C`` on the LUV L-channel — the
    reference's `differentialable_event_simu` (`loss_utils.py:234-249`).

    Args:
        image, image_next: [..., H, W, 3] (or 1-channel) frames.
        contrast: scalar (possibly learnable) contrast threshold C.

    Returns:
        [..., H, W, 1] signed event-count-like frame.
    """
    l1 = rgb_to_luv_l(image)
    l2 = rgb_to_luv_l(image_next)
    return (jnp.log(l2 + LOG_EPS) - jnp.log(l1 + LOG_EPS)) / contrast


def event_mixture_loss(
    render_now,
    render_next,
    render_main,
    gt_now,
    gt_next,
    gt_main,
    contrast,
    gt_contrast: float = 0.17,
    event_weight: float = 0.9,
):
    """The event-mode training loss (reference `train.py:165-196`).

    ``loss1``: L1 between the rendered pair's log-diff (learnable C) and the
    GT pair's log-diff (fixed C=0.17).  ``loss2``: L1 between the main render
    and its GT intensity image.  Both are scalars; they are mixed by the
    event-coverage fraction: with mask = (gt_diff ≠ 0),

        loss = (w·loss1·Σmask + (1-w)·loss2·Σ(1-mask)) / HW

    (the reference multiplies scalar losses by the mask image and sums —
    algebraically exactly this coverage-weighted mix).

    Returns:
        (loss, aux dict with loss1/loss2/coverage).
    """
    img_diff = event_log_diff(render_now, render_next, contrast)
    gt_diff = event_log_diff(gt_now, gt_next, gt_contrast)

    loss1 = l1_loss(img_diff, gt_diff)
    loss2 = l1_loss(render_main, gt_main)

    coverage = jnp.mean((gt_diff != 0.0).astype(img_diff.dtype))
    loss = event_weight * loss1 * coverage + (1.0 - event_weight) * loss2 * (
        1.0 - coverage
    )
    return loss, {"event_l1": loss1, "intensity_l1": loss2, "coverage": coverage}


def thresholded_event_l1(network_output, gt, thresh: float = 0.5) -> jnp.ndarray:
    """Band-tolerant event-count L1 (reference `l1_loss_gray_event`,
    `loss_utils.py:49-63`): differences within ±thresh of the GT count are
    free; the negative side is reweighted by the positive/negative count
    ratio."""
    out = rgb_to_grayscale(network_output)
    g = rgb_to_grayscale(gt)
    abs1 = jnp.abs(out - g - thresh)
    abs2 = jnp.abs(g - out - thresh)
    ratio = jnp.sum(g > 0).astype(out.dtype) / jnp.maximum(
        jnp.sum(g < 0).astype(out.dtype), 1.0
    )
    loss = jnp.where(
        g > 0,
        jnp.maximum(abs1 - thresh, 0.0),
        jnp.maximum(abs2 - thresh, 0.0) * ratio,
    )
    return jnp.mean(loss)


def dice_loss(network_output, gt, smooth: float = 1e-8) -> jnp.ndarray:
    """Dice overlap loss on grayscale frames (reference `Dice_Loss`,
    `loss_utils.py:64-78`)."""
    out = rgb_to_grayscale(network_output)
    g = rgb_to_grayscale(gt)
    intersection = out * g
    dice = (2.0 * intersection + smooth) / (out + g + smooth)
    return jnp.mean(1.0 - dice)
