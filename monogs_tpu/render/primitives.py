"""Per-Gaussian preprocessing: projection, EWA 2D covariance, color, culling.

This is the dense, fully-vectorized stage of the renderer — [N]-shaped math
that XLA maps straight onto the VPU. It reproduces the forward semantics of
the CUDA rasterizer's preprocess kernel (diff-gaussian-rasterization,
reconstructed from call sites — see SURVEY.md section 2.2.1): frustum cull at
z <= 0.2, EWA splat covariance with the 1.3*tan_fov clamp and +0.3 pixel
dilation, 3-sigma radius from the dominant eigenvalue, SH->RGB with clamp at
zero.

Performance note: everything is written as scalar column ops over [N] —
no [N, 3, 3] batched matmuls. Tiny trailing dimensions force XLA to pad each
3x3 into an (8, 128) tile, wasting >99% of the VPU; the scalar form runs two
orders of magnitude faster on TPU.

Differentiability: plain jnp throughout, so jax.grad provides the analytic
gradients w.r.t. Gaussian parameters *and* the camera pose that the
reference needed a hand-written CUDA backward (the "-w-pose" fork) for. The
pose enters through T_cw = Exp(tau) @ T_base with tau the 6-dim tangent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sh as sh_ops
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
    (gaussian_model.py:69-75). Returns the 6 unique entries as [N] columns
    (xx, xy, xz, yy, yz, zz)."""
    S = jnp.exp(log_scale) * scale_modifier  # [N, 3]
    n = jnp.sqrt(jnp.sum(quat * quat, axis=-1))
    q = quat / jnp.maximum(n, 1e-12)[:, None]
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = (
        (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)),
        (2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)),
        (2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)),
    )
    M = [[R[i][j] * S[:, j] for j in range(3)] for i in range(3)]

    def dot(i, j):
        return M[i][0] * M[j][0] + M[i][1] * M[j][1] + M[i][2] * M[j][2]

    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


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
    px = xyz[:, 0] * R[0, 0] + xyz[:, 1] * R[0, 1] + xyz[:, 2] * R[0, 2] + t[0]
    py = xyz[:, 0] * R[1, 0] + xyz[:, 1] * R[1, 1] + xyz[:, 2] * R[1, 2] + t[1]
    pz = xyz[:, 0] * R[2, 0] + xyz[:, 1] * R[2, 1] + xyz[:, 2] * R[2, 2] + t[2]
    z = pz
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / zs

    u = intr.fx * px * inv_z + intr.cx - 0.5
    v = intr.fy * py * inv_z + intr.cy - 0.5
    if means2d_offset is not None:
        # Zero-valued hook whose gradient is the screen-space mean gradient
        # used for densification stats (the torch "screenspace_points" trick,
        # gaussian_renderer/__init__.py:46-55). Scaled to NDC units to match
        # the CUDA rasterizer's dL/dmean2D convention.
        u = u + means2d_offset[:, 0] * (2.0 / intr.width)
        v = v + means2d_offset[:, 1] * (2.0 / intr.height)
    mean2d = jnp.stack([u, v], axis=-1)

    sxx, sxy, sxz, syy, syz, szz = covariance3d(log_scale, quat, scale_modifier)

    # EWA projection of the covariance with view-ray clamping:
    # JW (2x3) rows per gaussian, with J the projection Jacobian and W = R
    limx = 1.3 * intr.tan_fovx
    limy = 1.3 * intr.tan_fovy
    txz = jnp.clip(px * inv_z, -limx, limx)
    tyz = jnp.clip(py * inv_z, -limy, limy)
    j00 = intr.fx * inv_z
    j02 = -intr.fx * txz * inv_z
    j11 = intr.fy * inv_z
    j12 = -intr.fy * tyz * inv_z
    jw0 = [j00 * R[0, c] + j02 * R[2, c] for c in range(3)]
    jw1 = [j11 * R[1, c] + j12 * R[2, c] for c in range(3)]

    # cov2d = JW Sigma JW^T via the symmetric 3x3 entries
    def sig_vec(w):
        return (
            sxx * w[0] + sxy * w[1] + sxz * w[2],
            sxy * w[0] + syy * w[1] + syz * w[2],
            sxz * w[0] + syz * w[1] + szz * w[2],
        )

    s0 = sig_vec(jw0)
    a = jw0[0] * s0[0] + jw0[1] * s0[1] + jw0[2] * s0[2] + 0.3
    b = jw1[0] * s0[0] + jw1[1] * s0[1] + jw1[2] * s0[2]
    s1 = sig_vec(jw1)
    c = jw1[0] * s1[0] + jw1[1] * s1[1] + jw1[2] * s1[2] + 0.3

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
