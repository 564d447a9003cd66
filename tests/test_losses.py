"""Loss-function semantics: signed sqrt-Huber (value + custom gradient),
exposure, scalar tracking losses, median depth (torch lower-median)."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.ops import losses


def test_huber_identity_below_delta():
    x = jnp.array([-0.005, 0.0, 0.005])
    np.testing.assert_allclose(losses.huber_signed(x, 0.01), x, atol=1e-8)


def test_huber_sqrt_branch_and_continuity():
    delta = 0.01
    x = jnp.array([0.5, -0.5])
    expected = np.sign(x) * np.sqrt(2 * delta * np.abs(x) - delta**2)
    np.testing.assert_allclose(losses.huber_signed(x, delta), expected, rtol=1e-6)
    # continuous at |x| = delta
    lo = float(losses.huber_signed(jnp.float32(delta - 1e-7), delta))
    hi = float(losses.huber_signed(jnp.float32(delta + 1e-7), delta))
    assert abs(hi - lo) < 1e-5


def test_huber_gradient_matches_reference_backward():
    """slam_utils.py:68-75: grad = 1 below delta, delta/sqrt(2*delta*|x|-d^2)
    above."""
    delta = 0.01
    g = jax.grad(lambda x: jnp.sum(losses.huber_signed(x, delta)))
    x = jnp.array([0.004, 0.5, -0.3])
    got = np.asarray(g(x))
    expected = np.array(
        [1.0]
        + [delta / np.sqrt(2 * delta * abs(v) - delta**2) for v in [0.5, -0.3]]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_exposure_semantics():
    img = jnp.ones((3, 4, 4)) * 0.5
    out = losses.apply_exposure(img, jnp.float32(-2.0), jnp.float32(0.1))
    # (|a| + eps) * I + b
    np.testing.assert_allclose(out, 2.0 * 0.5 + 0.1, rtol=1e-6)


def test_scalar_tracking_losses():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (3, 8, 8))
    gt = img + 0.1
    opa = jnp.ones((1, 8, 8))
    mask = jnp.ones((1, 8, 8))
    l_rgb = losses.tracking_loss_scalar_rgb(
        img, gt, opa, mask, jnp.float32(1.0), jnp.float32(0.0)
    )
    assert np.isclose(float(l_rgb), 0.1, atol=1e-5)
    depth = jnp.full((1, 8, 8), 2.0)
    gt_depth = jnp.full((1, 8, 8), 2.5)
    l_rgbd = losses.tracking_loss_scalar_rgbd(
        img, depth, gt, gt_depth, opa, mask,
        jnp.float32(1.0), jnp.float32(0.0), alpha=0.9,
    )
    assert np.isclose(float(l_rgbd), 0.9 * 0.1 + 0.1 * 0.5, atol=1e-4)


def test_median_depth_lower_median():
    depth = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2)
    opa = jnp.ones_like(depth)
    med = losses.get_median_depth(depth, opa)
    assert float(med) == 2.0  # torch lower-median of [1,2,3,4]


def test_median_depth_ignores_invalid():
    depth = jnp.array([[0.0, 2.0], [3.0, 100.0]]).reshape(1, 2, 2)
    opa = jnp.array([[1.0, 1.0], [1.0, 0.5]]).reshape(1, 2, 2)
    # valid: depth>0 AND opacity>0.95 -> [2, 3]; lower median = 2
    med = losses.get_median_depth(depth, opa)
    assert float(med) == 2.0
