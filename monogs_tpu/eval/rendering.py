"""Rendering quality evaluation: PSNR / SSIM / LPIPS.

Equivalent of eval_rendering (/root/reference/utils/eval_utils.py:114-178):
every `interval`-th non-keyframe frame is re-rendered from its tracked pose
and compared to ground truth. PSNR is computed over the gt>0 mask as in the
reference; SSIM uses the 11x11 Gaussian-window formulation. LPIPS(alex)
requires pretrained torch weights — in this zero-egress environment they may
be unavailable, in which case lpips is reported as NaN with a warning.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.image import ssim as ssim_fn
from ..render import render
from ..utils.logging import Log

_lpips_model = None
_lpips_failed = False


def _lpips(img_a, img_b):
    """LPIPS(alex, normalize=True) via torchmetrics/torch on CPU, matching
    the reference (eval_utils.py:128-130). Returns NaN if weights are
    unavailable (no network egress)."""
    global _lpips_model, _lpips_failed
    if _lpips_failed:
        return float("nan")
    try:
        if _lpips_model is None:
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )

            _lpips_model = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True
            )
        import torch

        a = torch.from_numpy(np.asarray(img_a, np.float32))[None]
        b = torch.from_numpy(np.asarray(img_b, np.float32))[None]
        with torch.no_grad():
            return float(_lpips_model(a, b))
    except Exception as e:  # pragma: no cover - environment dependent
        _lpips_failed = True
        Log(f"LPIPS unavailable ({type(e).__name__}); reporting NaN", tag="Eval")
        return float("nan")


def eval_rendering(
    frames,
    gaussians,
    dataset,
    save_dir,
    intr,
    render_cfg,
    kf_indices,
    iteration="final",
    interval: int = 5,
):
    end_idx = len(frames) - 1
    psnr_array, ssim_array, lpips_array = [], [], []
    cfg = render_cfg._replace(with_n_touched=False)
    kf_set = set(kf_indices)
    for idx in range(0, end_idx, interval):
        if idx in kf_set or idx not in frames:
            continue
        frame = frames[idx]
        gt_image, _, _ = dataset[idx]
        gt_image = jnp.asarray(gt_image)
        out = render(gaussians.render_view(), frame.T, intr, cfg)
        image = jnp.clip(out.image, 0.0, 1.0)
        mask = gt_image > 0
        # the reference computes psnr over the masked pixel vector
        # (eval_utils.py:150-152); correct the full-image mse by the mask
        # density to get the same statistic
        n_valid = max(float(jnp.sum(mask)), 1.0)
        mse_full = float(jnp.mean(jnp.where(mask, (image - gt_image) ** 2, 0.0)))
        mse = mse_full * mask.size / n_valid
        psnr_score = float(20.0 * np.log10(1.0 / np.sqrt(max(mse, 1e-12))))
        ssim_score = float(ssim_fn(image, gt_image))
        lpips_score = _lpips(image, gt_image)
        psnr_array.append(psnr_score)
        ssim_array.append(ssim_score)
        lpips_array.append(lpips_score)

    output = {
        "mean_psnr": float(np.mean(psnr_array)) if psnr_array else float("nan"),
        "mean_ssim": float(np.mean(ssim_array)) if ssim_array else float("nan"),
        "mean_lpips": float(np.mean(lpips_array)) if lpips_array else float("nan"),
    }
    Log(
        f'mean psnr: {output["mean_psnr"]}, ssim: {output["mean_ssim"]}, '
        f'lpips: {output["mean_lpips"]}',
        tag="Eval",
    )
    if save_dir is not None:
        psnr_save_dir = os.path.join(save_dir, "psnr", str(iteration))
        os.makedirs(psnr_save_dir, exist_ok=True)
        with open(os.path.join(psnr_save_dir, "final_result.json"), "w") as f:
            json.dump(output, f, indent=4)
    return output
