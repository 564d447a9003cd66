"""Pallas fused blend kernel vs the XLA path (interpreter mode on CPU):
forward parity and hand-derived backward vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.render import GaussianArrays, Intrinsics, RenderConfig, render

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
XLA = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=256,
                   with_n_touched=False)
PAL = XLA._replace(backend="pallas", pallas_interpret=True)


def make_scene(n=96, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xyz = jnp.concatenate(
        [1.0 * jax.random.normal(k1, (n, 2)),
         3.0 + 0.5 * jax.random.normal(k2, (n, 1))], axis=-1)
    return GaussianArrays(
        xyz=xyz,
        sh=jax.random.uniform(k3, (n, 1, 3), minval=-1.0, maxval=1.0),
        log_scale=jnp.log(0.05 + 0.1 * jax.random.uniform(k4, (n, 3))),
        quat=jax.random.normal(k5, (n, 4)) + jnp.array([2.0, 0, 0, 0]),
        opa_logit=jnp.full((n, 1), 1.5),
        active=jnp.ones((n,), bool),
    )


def test_pallas_forward_matches_xla():
    gauss = make_scene()
    T = jnp.eye(4)
    a = render(gauss, T, INTR, XLA)
    b = render(gauss, T, INTR, PAL)
    np.testing.assert_allclose(b.image, a.image, atol=3e-5)
    np.testing.assert_allclose(b.depth, a.depth, atol=3e-4)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=3e-5)


def test_pallas_forward_with_background():
    gauss = make_scene(24, seed=2)
    bgc = jnp.array([0.3, 0.1, 0.6])
    a = render(gauss, jnp.eye(4), INTR, XLA, bg=bgc)
    b = render(gauss, jnp.eye(4), INTR, PAL, bg=bgc)
    np.testing.assert_allclose(b.image, a.image, atol=3e-5)


def test_pallas_backward_matches_xla():
    gauss = make_scene(64, seed=3)
    T = jnp.eye(4)
    target = render(gauss, T, INTR, XLA).image * 0.9
    active = gauss.active

    def loss(leaves, tau, cfg):
        g = GaussianArrays(*leaves, active=active)
        out = render(g, T, INTR, cfg, tau=tau)
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.1 * jnp.mean(out.depth)
            + 0.05 * jnp.mean(out.opacity)
        )

    leaves = (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat, gauss.opa_logit)
    tau0 = jnp.zeros(6)
    ga, ta = jax.grad(loss, argnums=(0, 1))(leaves, tau0, XLA)
    gb, tb = jax.grad(loss, argnums=(0, 1))(leaves, tau0, PAL)
    np.testing.assert_allclose(tb, ta, rtol=2e-3, atol=1e-6)
    for name, x, y in zip(
        ["xyz", "sh", "log_scale", "quat", "opa_logit"], gb, ga
    ):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-5, err_msg=name)


def test_pallas_nondivisible_image():
    intr = Intrinsics(fx=60.0, fy=60.0, cx=24.5, cy=19.5, width=50, height=40)
    gauss = make_scene(48, seed=5)
    a = render(gauss, jnp.eye(4), intr, XLA)
    b = render(gauss, jnp.eye(4), intr, PAL)
    np.testing.assert_allclose(b.image, a.image, atol=3e-5)
    assert b.image.shape == (3, 40, 50)


PALC = XLA._replace(backend="pallas_compact", pallas_interpret=True)


def test_pallas_compact_forward_matches_xla():
    gauss = make_scene()
    T = jnp.eye(4)
    a = render(gauss, T, INTR, XLA)
    b = render(gauss, T, INTR, PALC)
    np.testing.assert_allclose(b.image, a.image, atol=3e-5)
    np.testing.assert_allclose(b.depth, a.depth, atol=3e-4)
    np.testing.assert_allclose(b.opacity, a.opacity, atol=3e-5)


def test_pallas_compact_backward_matches_xla():
    gauss = make_scene(64, seed=3)
    T = jnp.eye(4)
    target = render(gauss, T, INTR, XLA).image * 0.9
    active = gauss.active

    def loss(leaves, tau, cfg):
        g = GaussianArrays(*leaves, active=active)
        out = render(g, T, INTR, cfg, tau=tau)
        return (
            jnp.mean(jnp.abs(out.image - target))
            + 0.1 * jnp.mean(out.depth)
            + 0.05 * jnp.mean(out.opacity)
        )

    leaves = (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat, gauss.opa_logit)
    tau0 = jnp.zeros(6)
    ga, ta = jax.grad(loss, argnums=(0, 1))(leaves, tau0, XLA)
    gb, tb = jax.grad(loss, argnums=(0, 1))(leaves, tau0, PALC)
    np.testing.assert_allclose(tb, ta, rtol=2e-3, atol=1e-6)
    for name, x, y in zip(
        ["xyz", "sh", "log_scale", "quat", "opa_logit"], gb, ga
    ):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-5, err_msg=name)


def test_pallas_compact_truncation_matches_xla_sort():
    """Both paths truncate to the depth-nearest k_fine; heavy overflow must
    agree exactly."""
    tiny_xla = XLA._replace(k_fine=16)
    tiny_pal = PALC._replace(k_fine=16)
    gauss = make_scene(96, seed=7)
    a = render(gauss, jnp.eye(4), INTR, tiny_xla)
    b = render(gauss, jnp.eye(4), INTR, tiny_pal)
    np.testing.assert_allclose(b.image, a.image, atol=3e-5)
