import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_tpu.ops import se3


def test_so3_exp_identity():
    R = se3.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_so3_exp_known_rotation():
    # 90 degrees about z
    theta = jnp.array([0.0, 0.0, np.pi / 2])
    R = se3.so3_exp(theta)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_so3_exp_orthonormal():
    key = jax.random.PRNGKey(0)
    thetas = jax.random.normal(key, (32, 3))
    Rs = se3.so3_exp(thetas)
    eyes = Rs @ np.swapaxes(Rs, -1, -2)
    np.testing.assert_allclose(eyes, np.broadcast_to(np.eye(3), eyes.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(Rs), 1.0, atol=1e-5)


def test_so3_small_angle_continuity():
    for eps in [1e-8, 1e-6, 1e-4]:
        theta = jnp.array([eps, 0.0, 0.0])
        R = se3.so3_exp(theta)
        assert np.isfinite(np.asarray(R)).all()
        np.testing.assert_allclose(R, np.eye(3), atol=1e-3)


def test_se3_exp_pure_translation():
    tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = se3.se3_exp(tau)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-7)


def test_se3_exp_inverse_roundtrip():
    key = jax.random.PRNGKey(1)
    tau = 0.3 * jax.random.normal(key, (6,))
    T = se3.se3_exp(tau)
    Tinv = se3.se3_inverse(T)
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-5)
    # exp(-tau) == inv(exp(tau))
    np.testing.assert_allclose(se3.se3_exp(-tau), Tinv, atol=1e-5)


def test_se3_exp_differentiable_at_zero():
    def f(tau):
        return jnp.sum(se3.se3_exp(tau) ** 2)

    g = jax.grad(f)(jnp.zeros(6))
    assert np.isfinite(np.asarray(g)).all()
    # translation part of the gradient of sum(T^2) at identity is 2*t = 0,
    # but d/drho of T[i,3]^2 contributions: T[:3,3] = rho at 0, so grad = 0
    jtest = jax.jacfwd(se3.se3_exp)(jnp.zeros(6))
    assert np.isfinite(np.asarray(jtest)).all()
    # dT[:3,3]/drho = I at tau=0
    np.testing.assert_allclose(jtest[:3, 3, :3], np.eye(3), atol=1e-5)


def test_retract_matches_reference_composition():
    key = jax.random.PRNGKey(2)
    tau = 0.1 * jax.random.normal(key, (6,))
    T = se3.se3_exp(0.5 * jax.random.normal(jax.random.PRNGKey(3), (6,)))
    np.testing.assert_allclose(se3.retract(T, tau), se3.se3_exp(tau) @ T, atol=1e-6)


def test_quat_to_rotmat_identity_and_norm():
    q = jnp.array([[1.0, 0, 0, 0], [2.0, 0, 0, 0]])
    Rs = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(Rs[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(Rs[1], np.eye(3), atol=1e-6)


def test_pose_diff():
    T1 = np.eye(4, dtype=np.float32)
    tau = jnp.array([0.0, 0, 0, 0, 0, np.pi / 4])
    T2 = se3.se3_exp(tau)
    trans, ang = se3.pose_diff(jnp.asarray(T1), T2)
    assert trans == pytest.approx(0.0, abs=1e-5)
    assert float(ang) == pytest.approx(np.pi / 4, abs=1e-4)
