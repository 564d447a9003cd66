"""Image-space ops: Scharr gradients, validity masks, edge masks, SSIM/PSNR.

Numerics mirror the reference (/root/reference/utils/slam_utils.py:7-41 and
/root/reference/utils/camera_utils.py:110-147) so that edge masks, keyframe
statistics and evaluation metrics are comparable. Images are channel-first
[C, H, W] float32 in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Scharr-like kernels as used by the reference (slam_utils.py:10-15). Note the
# reference names them conv_x/conv_y but convolves "v" with the horizontal-edge
# kernel; we reproduce the exact pairing.
_KERN_V = jnp.array([[3.0, 10.0, 3.0], [0.0, 0.0, 0.0], [-3.0, -10.0, -3.0]])
_KERN_H = jnp.array([[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]])
_NORMALIZER = 1.0 / 32.0


def _conv3x3(img, kernel):
    """Per-channel 3x3 'same' convolution with reflect padding. img: [C,H,W]."""
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        pad[:, None],  # [C, 1, H+2, W+2]
        kernel[None, None].astype(img.dtype),  # [1, 1, 3, 3]
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def image_gradient(image):
    """(grad_v, grad_h) per channel; mirrors slam_utils.py:7-24."""
    # torch conv2d cross-correlates, so the kernels are used as-is.
    grad_v = _NORMALIZER * _conv3x3(image, _KERN_V)
    grad_h = _NORMALIZER * _conv3x3(image, _KERN_H)
    return grad_v, grad_h


def image_gradient_mask(image, eps=0.01):
    """Masks of pixels whose full 3x3 neighborhood is valid (|I|>eps).

    Mirrors slam_utils.py:27-41 (both returned masks are identical there since
    both kernels are all-ones; we keep the two-value signature).
    """
    ones = jnp.ones((3, 3), dtype=image.dtype)
    valid = (jnp.abs(image) > eps).astype(image.dtype)
    # reflect-pad the boolean map exactly as the reference pads the image
    cnt = _conv3x3(valid, ones)
    m = cnt == 9.0
    return m, m


def torch_median(x):
    """Lower median (torch.median semantics: sorted[(n-1)//2]) of a 1D array."""
    n = x.shape[0]
    return jnp.sort(x)[(n - 1) // 2]


@functools.partial(jax.jit, static_argnames=("dataset_type", "patch_size"))
def compute_grad_mask(gt_image, edge_threshold, rgb_boundary_threshold,
                      dataset_type: str = "tum", patch_size: int = 32):
    """Edge-aware tracking mask + boundary mapping mask for one frame.

    Mirrors camera_utils.py:110-147. Returns (rgb_pixel_mask,
    rgb_pixel_mask_mapping), both [1, H, W] float32:
      - mapping mask: gt RGB channel-sum > boundary threshold,
      - tracking mask: mapping mask * gradient-intensity edge mask
        (global-median threshold; per-32x32-patch median for Replica, where
        out-of-grid border pixels fall to zero exactly like F.unfold/F.fold).
    """
    gray = jnp.mean(gt_image, axis=0, keepdims=True)
    gv, gh = image_gradient(gray)
    mv, mh = image_gradient_mask(gray)
    gv = gv * mv
    gh = gh * mh
    intensity = jnp.sqrt(gv * gv + gh * gh)[0]  # [H, W]
    H, W = intensity.shape

    if dataset_type == "replica":
        ph, pw = H // patch_size, W // patch_size
        crop = intensity[: ph * patch_size, : pw * patch_size]
        patches = crop.reshape(ph, patch_size, pw, patch_size)
        patches = patches.transpose(0, 2, 1, 3).reshape(ph * pw, -1)
        med = jax.vmap(torch_median)(patches).reshape(ph, pw)
        med_full = jnp.repeat(jnp.repeat(med, patch_size, 0), patch_size, 1)
        mask_crop = (crop > med_full * edge_threshold).astype(jnp.float32)
        grad_mask = jnp.zeros((H, W), jnp.float32).at[: ph * patch_size, : pw * patch_size].set(mask_crop)
        grad_mask = grad_mask[None]
    else:
        med = torch_median(intensity.reshape(-1))
        grad_mask = (intensity > med * edge_threshold)[None].astype(jnp.float32)

    boundary = (jnp.sum(gt_image, axis=0) > rgb_boundary_threshold)[None]
    rgb_pixel_mask_mapping = boundary.astype(jnp.float32)
    rgb_pixel_mask = rgb_pixel_mask_mapping * grad_mask
    return rgb_pixel_mask, rgb_pixel_mask_mapping


def psnr(img1, img2):
    """Per-image PSNR over flattened pixels, matching the reference's
    gaussian_splatting/utils/image_utils.py formula (20*log10(1/sqrt(mse)))."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(size=11, sigma=1.5):
    xs = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1, img2, window_size: int = 11):
    """SSIM with an 11x11 Gaussian window, 'same' zero padding, matching the
    reference's gaussian_splatting/utils/loss_utils.py ssim. imgs: [C, H, W]."""
    win = _gaussian_window(window_size)
    pad = window_size // 2

    def f(img):
        p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)))
        return jax.lax.conv_general_dilated(
            p[:, None], win[None, None].astype(img.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[:, 0]

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f(img1 * img1) - mu1_sq
    sigma2_sq = f(img2 * img2) - mu2_sq
    sigma12 = f(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
