"""Renderer tests: tiled TPU renderer vs the independent golden model, and
gradient checks for Gaussian parameters and the SE(3) pose tangent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_tpu.ops import se3
from monogs_tpu.render import (
    GaussianArrays,
    Intrinsics,
    RenderConfig,
    render,
    render_golden,
)

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128)


def make_scene(n=64, seed=0, spread=1.0, z0=3.0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xyz = jnp.concatenate(
        [
            spread * jax.random.normal(k1, (n, 2)),
            z0 + 0.5 * jax.random.normal(k2, (n, 1)),
        ],
        axis=-1,
    )
    sh = jax.random.uniform(k3, (n, 1, 3), minval=-1.0, maxval=1.0)
    log_scale = jnp.log(0.05 + 0.1 * jax.random.uniform(k4, (n, 3)))
    quat = jax.random.normal(k5, (n, 4)) + jnp.array([2.0, 0, 0, 0])
    opa = jnp.full((n, 1), 1.5)
    active = jnp.ones((n,), bool)
    return GaussianArrays(
        xyz=xyz, sh=sh, log_scale=log_scale, quat=quat, opa_logit=opa, active=active
    )


def test_tiled_matches_golden():
    gauss = make_scene(96)
    T = jnp.eye(4)
    out_g = render_golden(gauss, T, INTR)
    out_t = render(gauss, T, INTR, CFG)
    np.testing.assert_allclose(out_t.image, out_g.image, atol=2e-5)
    np.testing.assert_allclose(out_t.depth, out_g.depth, atol=2e-4)
    np.testing.assert_allclose(out_t.opacity, out_g.opacity, atol=2e-5)
    np.testing.assert_array_equal(out_t.n_touched, out_g.n_touched)
    np.testing.assert_array_equal(out_t.radii, out_g.radii)


def test_tiled_matches_golden_rotated_camera():
    gauss = make_scene(80, seed=3)
    tau = jnp.array([0.05, -0.02, 0.1, 0.03, -0.05, 0.02])
    T = se3.se3_exp(tau)
    out_g = render_golden(gauss, T, INTR)
    out_t = render(gauss, T, INTR, CFG)
    np.testing.assert_allclose(out_t.image, out_g.image, atol=2e-5)


def test_background_compositing():
    gauss = make_scene(4, spread=0.05)
    bg = jnp.array([0.2, 0.4, 0.6])
    out = render(gauss, jnp.eye(4), INTR, CFG, bg=bg)
    # far corner pixels should be pure background
    corner = np.asarray(out.image[:, 0, 0])
    np.testing.assert_allclose(corner, np.asarray(bg), atol=1e-4)


def test_empty_map_renders_background():
    gauss = make_scene(8)
    gauss = gauss._replace(active=jnp.zeros((8,), bool))
    out = render(gauss, jnp.eye(4), INTR, CFG)
    assert float(jnp.abs(out.image).max()) == 0.0
    assert int(out.n_touched.sum()) == 0


def test_grads_match_golden():
    """Gradients of the tiled renderer match the golden model's autodiff."""
    gauss = make_scene(48, seed=5)
    T = jnp.eye(4)
    target = render_golden(gauss, T, INTR).image + 0.05
    active = gauss.active

    def rebuild(leaves):
        return GaussianArrays(*leaves, active=active)

    leaves0 = (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat, gauss.opa_logit)

    def loss_tiled(leaves, tau):
        out = render(rebuild(leaves), T, INTR, CFG, tau=tau)
        return jnp.mean(jnp.abs(out.image - target))

    def loss_golden(leaves, tau):
        out = render_golden(rebuild(leaves), T, INTR, tau=tau)
        return jnp.mean(jnp.abs(out.image - target))

    tau0 = jnp.zeros(6)
    gt_g, gt_tau = jax.grad(loss_golden, argnums=(0, 1))(leaves0, tau0)
    tt_g, tt_tau = jax.grad(loss_tiled, argnums=(0, 1))(leaves0, tau0)
    np.testing.assert_allclose(tt_tau, gt_tau, rtol=1e-3, atol=1e-6)
    names = ["xyz", "sh", "log_scale", "quat", "opa_logit"]
    for name, a, b in zip(names, tt_g, gt_g):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5, err_msg=name)


def test_pose_grad_finite_difference():
    """Analytic pose-tangent gradient vs central finite differences."""
    gauss = make_scene(32, seed=7)
    T = jnp.eye(4)
    target = render_golden(gauss, T, INTR).image * 0.9

    def loss(tau):
        out = render(gauss, T, INTR, CFG, tau=tau)
        return jnp.mean((out.image - target) ** 2)

    tau0 = jnp.zeros(6)
    g = jax.grad(loss)(tau0)
    eps = 1e-4
    for i in range(6):
        e = jnp.zeros(6).at[i].set(eps)
        fd = (loss(tau0 + e) - loss(tau0 - e)) / (2 * eps)
        assert float(jnp.abs(g[i] - fd)) < 5e-3 * max(1.0, abs(float(fd))), (
            f"dim {i}: analytic {g[i]} vs fd {fd}"
        )


def test_means2d_offset_grad_nonzero():
    gauss = make_scene(32, seed=9)
    T = jnp.eye(4)

    def loss(off):
        out = render(gauss, T, INTR, CFG, means2d_offset=off)
        return jnp.mean(out.image**2)

    g = jax.grad(loss)(jnp.zeros((32, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_fine_capacity_overflow_drops_farthest():
    """With a tiny per-tile capacity the nearest Gaussians must win."""
    small = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=4)
    gauss = make_scene(64, seed=11, spread=0.2)
    out_small = render(gauss, jnp.eye(4), INTR, small)
    out_full = render(gauss, jnp.eye(4), INTR, CFG)
    # truncated render must keep opacity <= full render (+eps), never exceed
    assert float((out_small.opacity - out_full.opacity).max()) < 1e-4


def test_sh_degree3_view_dependence_and_golden_match():
    """sh_degree=3 path (spherical_harmonics configs): tiled matches golden
    and color actually varies with view direction."""
    n = 48
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 5)
    gauss = GaussianArrays(
        xyz=jnp.concatenate(
            [1.0 * jax.random.normal(ks[0], (n, 2)),
             3.0 + 0.3 * jax.random.normal(ks[1], (n, 1))], axis=-1),
        sh=jax.random.normal(ks[2], (n, 16, 3)) * 0.3,
        log_scale=jnp.log(0.08 + 0.1 * jax.random.uniform(ks[3], (n, 3))),
        quat=jax.random.normal(ks[4], (n, 4)) + jnp.array([2.0, 0, 0, 0]),
        opa_logit=jnp.full((n, 1), 1.5),
        active=jnp.ones((n,), bool),
    )
    cfg3 = CFG._replace(sh_degree=3)
    T = jnp.eye(4)
    out_g = render_golden(gauss, T, INTR, sh_degree=3)
    out_t = render(gauss, T, INTR, cfg3)
    np.testing.assert_allclose(out_t.image, out_g.image, atol=3e-5)

    # a big lateral move changes viewing directions -> colors change even
    # for the same gaussian coverage
    T2 = se3.se3_exp(jnp.array([1.2, 0.0, 0.0, 0.0, 0.0, 0.0]))
    out_moved = render(gauss, T2, INTR, cfg3)
    assert float(jnp.abs(out_moved.image - out_t.image).max()) > 1e-3

    # gradients flow into the higher-order coefficients
    def loss(sh):
        return jnp.mean(render(gauss._replace(sh=sh), T, INTR, cfg3).image)

    g = jax.grad(loss)(gauss.sh)
    assert float(jnp.abs(g[:, 1:, :]).max()) > 0


def test_big_splat_sidecar_overflow_keeps_strict_coverage():
    """More oversized splats than the k_big exact sidecar can hold: the
    overflow splats must still cover their STRICT span rect (the truncated
    fallback loses only margin coverage), so a margin-built render at the
    build pose matches the exact margin=0 render bit-for-bit (ADVICE r1:
    tiling.macro_instance_bin overflow path)."""
    n_big = 12
    key = jax.random.PRNGKey(7)
    # big splats: large scale at moderate depth -> radius spans many macro
    # cells; plus a backdrop of small ones
    small = make_scene(48, seed=1)
    xyz = jnp.concatenate(
        [0.3 * jax.random.normal(key, (n_big, 2)),
         jnp.full((n_big, 1), 2.0)], axis=-1
    )
    big = GaussianArrays(
        xyz=xyz,
        sh=jax.random.uniform(jax.random.PRNGKey(8), (n_big, 1, 3)),
        log_scale=jnp.log(jnp.full((n_big, 3), 0.35)),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_big, 1)),
        opa_logit=jnp.full((n_big, 1), -1.0),
        active=jnp.ones((n_big,), bool),
    )
    gauss = GaussianArrays(*[jnp.concatenate([a, b]) for a, b in
                             zip(small, big)])
    # tiny sidecar + tiny span_cap so the big splats overflow it
    cfg = CFG._replace(span_cap=2, k_big=4)
    from monogs_tpu.render.renderer import build_tile_lists

    T = jnp.eye(4)
    lists_exact = build_tile_lists(gauss, T, INTR, cfg)
    lists_margin, aux = build_tile_lists(gauss, T, INTR, cfg, margin=8.0,
                                         with_aux=True)
    out_e = render(gauss, T, INTR, cfg, lists=lists_exact)
    out_m = render(gauss, T, INTR, cfg, lists=lists_margin)
    np.testing.assert_allclose(out_m.image, out_e.image, atol=1e-6)
    np.testing.assert_allclose(out_m.opacity, out_e.opacity, atol=1e-6)
    # the big splats' strict span fits span_cap only if their radius spans
    # <= 2 macro cells; with 0.35 scale at z=2 it spans more -> counted
    assert int(aux.n_overflow) > 0

    # and with a generous span_cap nothing overflows and we match golden
    cfg2 = CFG._replace(span_cap=16, k_big=4)
    lists2 = build_tile_lists(gauss, T, INTR, cfg2)
    out2 = render(gauss, T, INTR, cfg2, lists=lists2)
    out_g = render_golden(gauss, T, INTR)
    np.testing.assert_allclose(out2.image, out_g.image, atol=2e-5)


def test_offgrid_inflated_splat_claims_no_edge_cells():
    """A splat whose margin-inflated box still misses the image must not be
    binned into edge macro cells (grid_span clips to the grid; the
    defensive mask in macro_instance_bin guards it)."""
    from monogs_tpu.render.tiling import macro_instance_bin

    u = jnp.array([-50.0, 30.0])
    v = jnp.array([20.0, 20.0])
    rad = jnp.array([10.0, 5.0])
    valid = jnp.ones((2,), bool)
    sel, vld, n_ov = macro_instance_bin(u, v, rad, valid, 2, 2, 32, 16)
    # splat 0 is entirely left of the grid: only splat 1 (rank 1) may appear
    assert not bool(jnp.any(vld & (sel == 0)))
    assert int(n_ov) == 0
