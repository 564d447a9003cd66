"""Per-Gaussian preprocessing: projection, EWA 2D covariance, color, culling.

This is the dense, fully-vectorized stage of the renderer — [N]-shaped math
that XLA maps straight onto the VPU/MXU. It reproduces the forward semantics
of the CUDA rasterizer's preprocess kernel (diff-gaussian-rasterization,
reconstructed from call sites — see SURVEY.md section 2.2.1): frustum cull at
z <= 0.2, EWA splat covariance with the 1.3*tan_fov clamp and +0.3 pixel
dilation, 3-sigma radius from the dominant eigenvalue, SH->RGB with clamp at
zero.

Differentiability: everything here is plain jnp, so jax.grad provides the
analytic gradients w.r.t. Gaussian parameters *and* the camera pose that the
reference needed a hand-written CUDA backward (the "-w-pose" fork) for. The
pose enters through T_cw = Exp(tau) @ T_base with tau the 6-dim tangent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3, sh as sh_ops
from .camera import Intrinsics


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray   # [N, 3] upper-triangular inverse 2D covariance
    opacity: jnp.ndarray  # [N]
    rgb: jnp.ndarray     # [N, 3]
    z: jnp.ndarray       # [N] camera-space depth
    radius: jnp.ndarray  # [N] float, 3-sigma radius in pixels (0 if culled)
    valid: jnp.ndarray   # [N] bool


def covariance3d(log_scale, quat, scale_modifier=1.0):
    """Sigma = (R S)(R S)^T from log-scales and unnormalized quaternions
    (gaussian_model.py:69-75)."""
    S = jnp.exp(log_scale) * scale_modifier  # [N, 3]
    R = se3.quat_to_rotmat(quat)  # [N, 3, 3]
    M = R * S[:, None, :]  # R @ diag(S)
    return M @ jnp.swapaxes(M, -1, -2)


def preprocess(
    xyz,
    log_scale,
    quat,
    opa_logit,
    sh_coeffs,  # [N, K, 3]
    active,
    T_cw,  # [4, 4] world->camera
    intr: Intrinsics,
    sh_degree: int = 0,
    near: float = 0.2,
    scale_modifier: float = 1.0,
    means2d_offset=None,
) -> Projected:
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    p_view = xyz @ R.T + t
    z = p_view[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    u = intr.fx * p_view[:, 0] / zs + intr.cx - 0.5
    v = intr.fy * p_view[:, 1] / zs + intr.cy - 0.5
    mean2d = jnp.stack([u, v], axis=-1)
    if means2d_offset is not None:
        # Zero-valued hook whose gradient is the screen-space mean gradient
        # used for densification stats (the torch "screenspace_points" trick,
        # gaussian_renderer/__init__.py:46-55). Scaled to NDC units to match
        # the CUDA rasterizer's dL/dmean2D convention.
        mean2d = mean2d + means2d_offset * jnp.array(
            [2.0 / intr.width, 2.0 / intr.height]
        )

    cov3d = covariance3d(log_scale, quat, scale_modifier)

    # EWA projection of the covariance with view-ray clamping
    limx = 1.3 * intr.tan_fovx
    limy = 1.3 * intr.tan_fovy
    txz = jnp.clip(p_view[:, 0] / zs, -limx, limx)
    tyz = jnp.clip(p_view[:, 1] / zs, -limy, limy)
    inv_z = 1.0 / zs
    # J = [[fx/z, 0, -fx*tx/z], [0, fy/z, -fy*ty/z]]  (2x3 per Gaussian)
    J = jnp.zeros((xyz.shape[0], 2, 3), xyz.dtype)
    J = J.at[:, 0, 0].set(intr.fx * inv_z)
    J = J.at[:, 0, 2].set(-intr.fx * txz * inv_z)
    J = J.at[:, 1, 1].set(intr.fy * inv_z)
    J = J.at[:, 1, 2].set(-intr.fy * tyz * inv_z)
    JW = J @ R  # [N, 2, 3]
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # [N, 2, 2]
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # color from SH: degree 0 needs no view direction; higher degrees use the
    # direction from the camera center to the Gaussian. (The reference's
    # Camera.camera_center is a known bug — it returns a matrix — but only
    # matters for sh_degree > 0 which its configs disable; we do it properly.)
    if sh_degree == 0:
        rgb = sh_ops.C0 * sh_coeffs[:, 0, :] + 0.5
    else:
        cam_center = -R.T @ t
        dirs = xyz - cam_center
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        shs = jnp.swapaxes(sh_coeffs, -1, -2)  # [N, 3, K]
        rgb = sh_ops.eval_sh(sh_degree, shs, dirs) + 0.5
    rgb = jnp.maximum(rgb, 0.0)

    opacity = jax.nn.sigmoid(opa_logit).reshape(-1)

    in_front = z > near
    on_screen = (
        (u + radius >= 0)
        & (u - radius <= intr.width - 1)
        & (v + radius >= 0)
        & (v - radius <= intr.height - 1)
    )
    valid = active & in_front & (det > 0) & (radius > 0) & on_screen
    radius = jnp.where(valid, radius, 0.0)

    return Projected(
        mean2d=mean2d,
        conic=conic,
        opacity=opacity,
        rgb=rgb,
        z=z,
        radius=radius,
        valid=valid,
    )
