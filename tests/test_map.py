"""Gaussian map state tests: insertion, Adam, densify/clone/split/prune at
fixed capacity, opacity resets, kNN, and keyframe unprojection."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.insertion import keyframe_to_gaussians
from monogs_tpu.ops.knn import mean_knn_sq_dist
from monogs_tpu.render.camera import Intrinsics

HYPER = gm.MapHyper()


def make_leaves(n, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    return gm.ParamLeaves(
        xyz=jax.random.normal(ks[0], (n, 3)),
        sh=jax.random.normal(ks[1], (n, 1, 3)) * 0.2,
        log_scale=jnp.full((n, 3), -3.0),
        quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        opa_logit=jnp.full((n, 1), 1.0),
    )


def test_insert_and_count():
    m = gm.new_map(64)
    leaves = make_leaves(16)
    m = gm.insert(m, leaves, jnp.int32(10), kf_id=3)
    assert int(m.n_active) == 10
    assert int((m.kf_id == 3).sum()) == 10
    # inserted rows land in the first 10 slots (all were free)
    np.testing.assert_allclose(m.params.xyz[:10], leaves.xyz[:10], atol=1e-6)
    # second insertion fills subsequent slots
    m = gm.insert(m, make_leaves(16, seed=1), jnp.int32(5), kf_id=7)
    assert int(m.n_active) == 15
    assert int((m.kf_id == 7).sum()) == 5


def test_insert_overflow_is_clamped():
    m = gm.new_map(8)
    m = gm.insert(m, make_leaves(16), jnp.int32(16), kf_id=0)
    assert int(m.n_active) == 8  # capacity bound, no corruption


def test_insert_reuses_freed_slots():
    m = gm.new_map(16)
    m = gm.insert(m, make_leaves(16), jnp.int32(12), kf_id=0)
    kill = jnp.zeros(16, bool).at[2].set(True).at[5].set(True)
    m = gm.prune(m, kill)
    assert int(m.n_active) == 10
    m2 = gm.insert(m, make_leaves(16, seed=2), jnp.int32(2), kf_id=1)
    assert int(m2.n_active) == 12
    assert bool(m2.active[2]) and bool(m2.active[5])
    assert int(m2.kf_id[2]) == 1 and int(m2.kf_id[5]) == 1


def test_adam_step_moves_active_only():
    m = gm.new_map(32)
    m = gm.insert(m, make_leaves(32), jnp.int32(16), kf_id=0)
    g = gm.ParamLeaves(*(jnp.ones_like(p) for p in m.params))
    m2 = gm.adam_step(m, g, HYPER, step=jnp.int32(1))
    moved = np.abs(np.asarray(m2.params.xyz - m.params.xyz)).sum(axis=-1)
    assert (moved[:16] > 0).all()
    assert (moved[16:] == 0).all()
    # first Adam step size is lr for each coordinate (bias-corrected)
    expected_lr = gm.xyz_lr_at(HYPER, 1)
    np.testing.assert_allclose(moved[:16] / 3.0, float(expected_lr), rtol=1e-4)


def test_densify_clone_adds_points():
    m = gm.new_map(64)
    leaves = make_leaves(16)
    m = gm.insert(m, leaves, jnp.int32(8), kf_id=0)
    # mark half the gaussians as high-gradient, small scale -> clone
    m = m._replace(
        grad_accum=jnp.zeros(64).at[:4].set(1.0),
        denom=jnp.zeros(64).at[:8].set(1.0),
    )
    m2 = gm.densify_and_prune(
        m, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, max_screen_size=None, h=HYPER,
        clone_cap=16, split_cap=8,
    )
    assert int(m2.n_active) == 12  # 8 originals + 4 clones
    # stats reset after densification
    assert float(m2.grad_accum.sum()) == 0.0
    assert float(m2.denom.sum()) == 0.0


def test_densify_split_replaces_with_two_children():
    m = gm.new_map(64)
    leaves = make_leaves(16)._replace(log_scale=jnp.full((16, 3), 1.0))  # huge
    m = gm.insert(m, leaves, jnp.int32(8), kf_id=0)
    m = m._replace(
        grad_accum=jnp.zeros(64).at[:2].set(1.0),
        denom=jnp.zeros(64).at[:8].set(1.0),
    )
    # percent_dense * extent = 1.0 < e so the big gaussians go to split
    m2 = gm.densify_and_prune(
        m, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, max_screen_size=None, h=HYPER,
        clone_cap=16, split_cap=8,
    )
    # 8 - 2 split parents + 4 children = 10
    assert int(m2.n_active) == 10
    # children have scale / 1.6
    child_scales = np.exp(np.asarray(m2.params.log_scale))[np.asarray(m2.active)]
    assert np.isclose(np.sort(child_scales[:, 0])[:4], np.e / 1.6, rtol=1e-4).all()


def test_densify_prunes_transparent():
    m = gm.new_map(64)
    leaves = make_leaves(16)._replace(opa_logit=jnp.full((16, 1), -8.0))
    m = gm.insert(m, leaves, jnp.int32(8), kf_id=0)
    m2 = gm.densify_and_prune(
        m, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=100.0, max_screen_size=None, h=HYPER,
        clone_cap=16, split_cap=8,
    )
    assert int(m2.n_active) == 0


def test_reset_opacity_nonvisible():
    m = gm.new_map(32)
    m = gm.insert(m, make_leaves(32), jnp.int32(8), kf_id=0)
    vis = jnp.zeros(32, bool).at[:4].set(True)
    m2 = gm.reset_opacity_nonvisible(m, vis)
    opa = jax.nn.sigmoid(m2.params.opa_logit[:, 0])
    np.testing.assert_allclose(opa[4:8], 0.4, atol=1e-5)
    np.testing.assert_allclose(
        opa[:4], jax.nn.sigmoid(m.params.opa_logit[:4, 0]), atol=1e-6
    )
    assert float(jnp.abs(m2.adam_m.opa_logit).sum()) == 0.0


def test_knn_against_naive():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (100, 3))
    out = mean_knn_sq_dist(pts, chunk=32)
    d = np.asarray(
        ((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2).sum(-1)
    )
    np.fill_diagonal(d, np.inf)
    naive = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, naive, rtol=1e-4)


def test_knn_respects_valid_mask():
    pts = jnp.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [100, 0, 0], [101, 0, 0]])
    valid = jnp.array([True, True, True, False, False])
    out = np.asarray(mean_knn_sq_dist(pts, valid, k=2, chunk=8))
    # point 0's 2-NN among valid: dist^2 1 and 4 -> mean 2.5
    assert np.isclose(out[0], 2.5)
    assert out[3] == 0.0 and out[4] == 0.0


def test_keyframe_to_gaussians():
    intr = Intrinsics(fx=50.0, fy=50.0, cx=15.5, cy=11.5, width=32, height=24)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (3, 24, 32))
    depth = jnp.full((24, 32), 2.0).at[:4].set(0.0)  # top rows invalid
    leaves, count = keyframe_to_gaussians(
        key, img, depth, jnp.eye(4), jnp.float32(1.0), jnp.float32(0.0),
        intr=intr, cap=512, sh_k=1, downsample_factor=2,
        point_size=0.05, adaptive_pointsize=False,
    )
    c = int(count)
    assert 200 < c < 420  # ~half of the 640 valid pixels
    pts = np.asarray(leaves.xyz[:c])
    assert np.allclose(pts[:, 2], 2.0, atol=1e-5)  # depth preserved
    assert np.isfinite(np.asarray(leaves.log_scale[:c])).all()
    # opacity initialized at 0.5
    np.testing.assert_allclose(
        jax.nn.sigmoid(leaves.opa_logit[:c, 0]), 0.5, atol=1e-6
    )
