"""Keyframe insertion: depth-map unprojection -> new Gaussians.

TPU-native replacement for GaussianModel.create_pcd_from_image[_and_depth]
(/root/reference/gaussian_splatting/scene/gaussian_model.py:108-205), which
routed through Open3D RGBD unprojection + random downsample + CUDA simple-knn.
Here it is one jitted function with static shapes: exposure-corrected color,
dense backprojection, Bernoulli(1/downsample) pixel selection compacted to a
fixed capacity, world-frame transform, and a brute-force 3-NN mean distance
(MXU matmuls) to set the initial log-scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import knn, losses, sh as sh_ops
from ..ops.se3 import se3_inverse
from ..render.camera import Intrinsics, backproject_pixels
from ..render.tiling import compact_indices
from .gaussian_map import ParamLeaves, inverse_sigmoid


@functools.partial(
    jax.jit,
    static_argnames=("intr", "cap", "sh_k", "adaptive_pointsize"),
)
def keyframe_to_gaussians(
    key,
    gt_image,        # [3, H, W]
    depthmap,        # [H, W] metric depth; 0/neg = invalid
    T_cw,            # [4, 4] world->camera
    exposure_a,
    exposure_b,
    intr: Intrinsics,
    cap: int,
    sh_k: int,
    downsample_factor,  # dynamic: only gates a uniform threshold, so the
    #                     init (pcd_downsample_init) and steady-state
    #                     (pcd_downsample) inserts share ONE compilation
    #                     (each variant cost 18-50 s of XLA compile on TPU)
    point_size: float,
    adaptive_pointsize: bool,
):
    """Returns (ParamLeaves with `cap` rows, count of valid rows).

    Matches reference semantics: exposure-corrected clamped color quantized
    through uint8, depth truncation at 100m, random 1/downsample keep,
    initial scale = sqrt(point_size * mean-3NN-squared-distance) isotropic,
    identity rotation, opacity 0.5.
    """
    h, w = depthmap.shape
    img_ab = jnp.clip(losses.apply_exposure(gt_image, exposure_a, exposure_b), 0.0, 1.0)
    img_ab = jnp.floor(img_ab * 255.0) / 255.0  # byte-image round trip (:113)

    pts_cam = backproject_pixels(depthmap, intr)        # [H, W, 3]
    valid = (depthmap > 0) & (depthmap < 100.0)         # depth_trunc=100 (:148)
    keep = valid & (
        jax.random.uniform(key, (h, w)) < 1.0 / downsample_factor
    )
    sel, ok, count = compact_indices(keep.reshape(-1), cap)

    pts = pts_cam.reshape(-1, 3)[sel]
    cols = img_ab.transpose(1, 2, 0).reshape(-1, 3)[sel]

    T_wc = se3_inverse(T_cw)
    pts_world = pts @ T_wc[:3, :3].T + T_wc[:3, 3]
    pts_world = jnp.where(ok[:, None], pts_world, 0.0)

    if adaptive_pointsize:
        # min(0.05, point_size * median(depth)) over the full depth image,
        # zeros included, exactly as np.median(depth) at :143
        ps = jnp.minimum(0.05, point_size * jnp.median(depthmap))
    else:
        ps = jnp.asarray(point_size, jnp.float32)

    d2 = jnp.maximum(knn.mean_knn_sq_dist(pts_world, ok, k=3), 1e-7) * ps
    log_scale = jnp.log(jnp.sqrt(d2))[:, None] * jnp.ones((1, 3))

    sh = jnp.zeros((cap, sh_k, 3), jnp.float32)
    sh = sh.at[:, 0, :].set(sh_ops.rgb_to_sh(cols))
    quat = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (cap, 1))
    opa = jnp.full((cap, 1), inverse_sigmoid(jnp.float32(0.5)))

    leaves = ParamLeaves(
        xyz=pts_world,
        sh=sh,
        log_scale=jnp.where(ok[:, None], log_scale, -10.0),
        quat=quat,
        opa_logit=opa,
    )
    return leaves, count
