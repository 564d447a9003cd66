"""Tracking / mapping losses, signed sqrt-Huber, affine exposure.

Semantics mirror /root/reference/utils/slam_utils.py:
  - apply_exposure: image_ab = (|a| + eps) * image + b   (:85, :130)
  - signed sqrt-Huber with custom gradient (:58-75): below delta it is the
    identity (so that ||huber(r)||_2^2 is quadratic), above it is
    sign(r)*sqrt(2*delta*|r| - delta^2) with gradient delta/sqrt(...)
  - per-pixel tracking residual (:201-205): opacity * mask * (image - gt),
    using the *mapping* (boundary-only) mask as the fork's per-pixel path does
  - scalar tracking losses (:91-113) and mapping losses (:235-253)
  - get_median_depth (:286-297), with torch lower-median semantics

All functions are jnp-pure and jit/vmap-friendly; frames are passed as plain
arrays, not objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import torch_median

EXPOSURE_EPS = 1e-8


def apply_exposure(image, exposure_a, exposure_b):
    return (jnp.abs(exposure_a) + EXPOSURE_EPS) * image + exposure_b


@jax.custom_jvp
def huber_signed(x, delta):
    """Signed sqrt-Huber (slam_utils.py:58-75). Identity below delta."""
    ax = jnp.abs(x)
    safe = jnp.sqrt(jnp.maximum(2.0 * delta * ax - delta * delta, 1e-20))
    return jnp.where(ax < delta, x, jnp.sign(x) * safe)


@huber_signed.defjvp
def _huber_jvp(primals, tangents):
    x, delta = primals
    dx, _ = tangents
    ax = jnp.abs(x)
    safe = jnp.sqrt(jnp.maximum(2.0 * delta * ax - delta * delta, 1e-20))
    primal_out = jnp.where(ax < delta, x, jnp.sign(x) * safe)
    slope = jnp.where(ax < delta, 1.0, delta / safe)
    return primal_out, slope * dx


def tracking_residual_rgb(image, gt_image, opacity, mapping_mask,
                          exposure_a, exposure_b):
    """Signed per-pixel tracking residual [3, H, W] (slam_utils.py:188-205).

    The fork's per-pixel path applies the boundary-only mapping mask (not the
    edge mask) and weights by rendered opacity.
    """
    image_ab = apply_exposure(image, exposure_a, exposure_b)
    return opacity * (image_ab * mapping_mask - gt_image * mapping_mask)


def tracking_loss_scalar_rgb(image, gt_image, opacity, rgb_pixel_mask,
                             exposure_a, exposure_b):
    """Mean masked opacity-weighted L1 (slam_utils.py:91-100), edge mask."""
    image_ab = apply_exposure(image, exposure_a, exposure_b)
    l1 = opacity * jnp.abs(image_ab * rgb_pixel_mask - gt_image * rgb_pixel_mask)
    return jnp.mean(l1)


def tracking_loss_scalar_rgbd(image, depth, gt_image, gt_depth, opacity,
                              rgb_pixel_mask, exposure_a, exposure_b,
                              alpha=0.95):
    """RGB-D scalar tracking loss (slam_utils.py:103-113)."""
    l1_rgb = tracking_loss_scalar_rgb(
        image, gt_image, opacity, rgb_pixel_mask, exposure_a, exposure_b
    )
    depth_pixel_mask = (gt_depth > 0.01).astype(depth.dtype)
    opacity_mask = (opacity > 0.95).astype(depth.dtype)
    depth_mask = depth_pixel_mask * opacity_mask
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return alpha * l1_rgb + (1 - alpha) * jnp.mean(l1_depth)


def mapping_loss_rgb(image, gt_image, mapping_mask, exposure_a, exposure_b,
                     initialization=False):
    """Mean masked L1 (slam_utils.py:224-240)."""
    image_ab = image if initialization else apply_exposure(image, exposure_a, exposure_b)
    l1 = jnp.abs(image_ab * mapping_mask - gt_image * mapping_mask)
    return jnp.mean(l1)


def mapping_loss_rgbd(image, depth, gt_image, gt_depth, mapping_mask,
                      exposure_a, exposure_b, alpha=0.95, initialization=False):
    """RGB-D mapping loss (slam_utils.py:243-253)."""
    image_ab = image if initialization else apply_exposure(image, exposure_a, exposure_b)
    l1_rgb = jnp.abs(image_ab * mapping_mask - gt_image * mapping_mask)
    depth_pixel_mask = (gt_depth > 0.01).astype(depth.dtype)
    l1_depth = jnp.abs(depth * depth_pixel_mask - gt_depth * depth_pixel_mask)
    return alpha * jnp.mean(l1_rgb) + (1 - alpha) * jnp.mean(l1_depth)


def isotropic_reg(scaling, active_mask):
    """10 * mean |s - mean_row(s)| over active Gaussians (slam_backend.py:244-246)."""
    dev = jnp.abs(scaling - jnp.mean(scaling, axis=1, keepdims=True))
    m = active_mask[:, None].astype(scaling.dtype)
    denom = jnp.maximum(jnp.sum(m) * scaling.shape[1], 1.0)
    return jnp.sum(dev * m) / denom


def get_median_depth(depth, opacity=None, mask=None, return_std=False):
    """Median (and std) of valid rendered depth (slam_utils.py:286-297).

    Uses masked sorting so shapes stay static: invalid entries are pushed to
    +inf and the lower median is taken over the valid count.
    """
    d = depth.reshape(-1)
    valid = d > 0
    if opacity is not None:
        valid = jnp.logical_and(valid, opacity.reshape(-1) > 0.95)
    if mask is not None:
        valid = jnp.logical_and(valid, mask.reshape(-1))
    n_valid = jnp.sum(valid)
    sorted_d = jnp.sort(jnp.where(valid, d, jnp.inf))
    med_idx = jnp.maximum((n_valid - 1) // 2, 0)
    median = sorted_d[med_idx]
    if not return_std:
        return median
    mean = jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(n_valid, 1)
    var = jnp.sum(jnp.where(valid, (d - mean) ** 2, 0.0)) / jnp.maximum(n_valid - 1, 1)
    return median, jnp.sqrt(var), valid.reshape(depth.shape)
