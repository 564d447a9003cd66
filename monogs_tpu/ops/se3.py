"""SE(3) / SO(3) Lie-group math in pure jnp.

Semantics follow the reference's hand-rolled pose math
(/root/reference/utils/pose_utils.py:26-98) — SO3 exp with small-angle branch,
the left-Jacobian `V`, SE3 exp with tau = [rho(3), theta(3)] (translation
first), and the left-multiplicative retraction T <- Exp(tau) @ T used by the
tracking/mapping optimizers. Everything here is jittable and differentiable;
branches use jnp.where with safe denominators instead of Python conditionals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-5


def _mm(a, b):
    """4x4/3x3 pose-composition matmul at exact f32 precision. The TPU
    default single-pass bf16 matmul would quantize O(1) pose entries to
    ~4e-3 absolute (= mm-to-cm translation error, ~0.2 deg rotation) —
    measured on v5e via the bench seed function. These matrices are tiny,
    so HIGHEST costs nothing."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (batched over leading dims)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


# The coefficient helpers take the *squared* angle so that gradients are
# finite at theta = 0 (||theta|| itself has a NaN gradient there, which would
# leak through jnp.where — the classic where-NaN trap). The sqrt below is
# guarded with a tiny floor; its huge-but-finite tangent is masked out by the
# where select.
# Floor large enough that x3^2 (appearing in reverse-mode quotient rules of
# the untaken branch) never underflows to 0 in float32.
_TINY = 1e-12


def _sin_over_x(x2):
    """sin(x)/x as a function of x^2, with Taylor fallback near 0."""
    x = jnp.sqrt(jnp.maximum(x2, _TINY))
    small = 1.0 - x2 / 6.0
    return jnp.where(x2 < _SMALL * _SMALL, small, jnp.sin(x) / x)


def _one_minus_cos_over_x2(x2):
    """(1-cos x)/x^2 as a function of x^2, with Taylor fallback."""
    x = jnp.sqrt(jnp.maximum(x2, _TINY))
    small = 0.5 - x2 / 24.0
    return jnp.where(x2 < _SMALL * _SMALL, small, (1.0 - jnp.cos(x)) / jnp.maximum(x2, _TINY))


def _x_minus_sin_over_x3(x2):
    """(x - sin x)/x^3 as a function of x^2, with Taylor fallback."""
    x = jnp.sqrt(jnp.maximum(x2, _TINY))
    small = 1.0 / 6.0 - x2 / 120.0
    x3 = jnp.maximum(x2, _TINY) * x
    return jnp.where(x2 < _SMALL * _SMALL, small, (x - jnp.sin(x)) / x3)


def so3_exp(theta):
    """Rodrigues' formula. theta: (..., 3) -> (..., 3, 3)."""
    angle2 = jnp.sum(theta * theta, axis=-1)
    W = skew(theta)
    W2 = _mm(W, W)
    a = _sin_over_x(angle2)[..., None, None]
    b = _one_minus_cos_over_x2(angle2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    return eye + a * W + b * W2


def so3_left_jacobian(theta):
    """V(theta): integrates translation under rotation (pose_utils.py:44-59)."""
    angle2 = jnp.sum(theta * theta, axis=-1)
    W = skew(theta)
    W2 = _mm(W, W)
    b = _one_minus_cos_over_x2(angle2)[..., None, None]
    c = _x_minus_sin_over_x3(angle2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    return eye + b * W + c * W2


def se3_exp(tau):
    """tau = [rho(3), theta(3)] -> 4x4 transform (pose_utils.py:62-74)."""
    rho = tau[..., :3]
    theta = tau[..., 3:]
    R = so3_exp(theta)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(theta), rho)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=tau.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T):
    """Inverse of a rigid transform (pose_utils.py:76-82)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def retract(T, tau):
    """Left-multiplicative retraction: Exp(tau) @ T (pose_utils.py:88-98)."""
    return _mm(se3_exp(tau), T)


def quat_to_rotmat(q):
    """Unnormalized quaternion (w, x, y, z) -> rotation matrix.

    Matches the reference's build_rotation (general_utils.py:114-137).
    q: (..., 4) -> (..., 3, 3).
    """
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return R


def pose_diff(P1, P2):
    """(translation distance, rotation angle) between two 4x4 poses.

    Mirrors pose_utils.py:107-119.
    """
    trans = jnp.linalg.norm(P1[:3, 3] - P2[:3, 3])
    # HIGHEST: this runs eagerly on TPU in metric reporting; the default
    # bf16 pass adds ~0.1 deg of noise to the angle, swamping mm-level errors
    dR = jnp.matmul(P1[:3, :3], P2[:3, :3].T,
                    precision=jax.lax.Precision.HIGHEST)
    cos_theta = jnp.clip((jnp.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
    return trans, jnp.arccos(cos_theta)


def relative_pose_error(P1_gt, P2_gt, P1, P2):
    """Relative pose error between frame pairs (pose_utils.py:100-104)."""
    dP_gt = _mm(se3_inverse(P1_gt), P2_gt)
    dP = _mm(se3_inverse(P1), P2)
    return pose_diff(dP_gt, dP)
