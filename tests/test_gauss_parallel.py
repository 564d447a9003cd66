"""Gaussian-parallel scale-out (parallel/gauss.py) on the virtual CPU mesh:
the map itself sharded over a "gauss" axis, per-tile survivor lists merged
via one all_gather — forward render and mapping gradients must match the
single-device lists path exactly (the merge is a selection identity, not an
approximation)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import __graft_entry__ as ge
from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.gaussian_map import ParamLeaves
from monogs_tpu.ops import losses
from monogs_tpu.parallel.gauss import (
    _local_rows, gp_map_loss_grad, gp_render_tiles, gp_tile_rows,
    make_gauss_mesh, shard_gauss,
)
from monogs_tpu.render import Intrinsics, RenderConfig, build_tile_lists, render
from monogs_tpu.render.renderer import _tile_origins, render_tiles, tile_images

INTR = Intrinsics(fx=80.0, fy=80.0, cx=31.5, cy=31.5, width=64, height=64)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=256, k_fine=128,
                   with_n_touched=False)


def full_map():
    scene = ge._tiny_scene(256)
    m0 = gm.new_map(512, sh_degree=0)
    leaves = ParamLeaves(
        xyz=jnp.pad(scene.xyz, ((0, 256), (0, 0))),
        sh=jnp.pad(scene.sh, ((0, 256), (0, 0), (0, 0))),
        log_scale=jnp.pad(scene.log_scale, ((0, 256), (0, 0))),
        quat=jnp.pad(scene.quat, ((0, 256), (0, 0))),
        opa_logit=jnp.pad(scene.opa_logit, ((0, 256), (0, 0))),
    )
    return gm.insert(m0, leaves, jnp.int32(256), kf_id=0)


def _merged_rows(gauss, mesh, margin):
    fn = jax.jit(
        jax.shard_map(
            lambda g: gp_tile_rows(g, jnp.eye(4), INTR, CFG, margin=margin),
            mesh=mesh, in_specs=(P("gauss"),), out_specs=P(),
            check_vma=False,
        )
    )
    return fn(shard_gauss(gauss, mesh))


def test_gp_rows_match_single_device_selection():
    """The merge picks the SAME rows as the single-device strict-first
    lists gather — vld masks are bit-identical and row values agree to
    ulp-level tolerance (preprocess compiles at [N/D] vs [N] shapes, so
    individual per-gaussian values can differ by 1-2 ulp even though the
    selection is an identity), with and without a bin margin."""
    m = full_map()
    gauss = m.render_view()
    mesh = make_gauss_mesh(4)
    for margin in (0.0, 3.0):
        d4, vld4 = _merged_rows(gauss, mesh, margin)
        d1, vld1 = _local_rows(gauss, jnp.eye(4), INTR, CFG, margin)
        np.testing.assert_array_equal(np.asarray(vld4), np.asarray(vld1))
        ok = np.asarray(vld1)[..., None]
        np.testing.assert_allclose(
            np.where(ok, np.asarray(d4), 0.0),
            np.where(ok, np.asarray(d1), 0.0),
            rtol=1e-5, atol=1e-5,
        )


def test_gp_render_matches_single_device():
    """gp_render_tiles over a 4-device gauss-sharded mesh == the
    single-device lists render, tile for tile (rows are exact — see
    test_gp_rows_bit_identical_to_single_device — so only blend-order
    reassociation noise remains)."""
    m = full_map()
    gauss = m.render_view()
    T = jnp.eye(4)
    mesh = make_gauss_mesh(4)

    fn = jax.jit(
        jax.shard_map(
            lambda g: gp_render_tiles(g, T, INTR, CFG, margin=0.0),
            mesh=mesh, in_specs=(P("gauss"),), out_specs=P(),
            check_vma=False,
        )
    )
    c4, d4, a4 = fn(shard_gauss(gauss, mesh))

    lists = build_tile_lists(gauss, T, INTR, CFG, margin=0.0)
    tx0, ty0 = _tile_origins(INTR, CFG)
    c1, d1, a1 = render_tiles(gauss, T, INTR, CFG, lists, tx0, ty0)

    np.testing.assert_allclose(np.asarray(c4), np.asarray(c1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d4), np.asarray(d1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a4), np.asarray(a1), atol=1e-4)


def test_gp_render_margin_matches_strict_first_lists():
    """With a bin margin, the merged selection must reproduce the
    single-device STRICT-FIRST margin lists (the strictness bit is
    recomputed per row inside the merge)."""
    m = full_map()
    gauss = m.render_view()
    T = jnp.eye(4)
    mesh = make_gauss_mesh(4)

    fn = jax.jit(
        jax.shard_map(
            lambda g: gp_render_tiles(g, T, INTR, CFG, margin=3.0),
            mesh=mesh, in_specs=(P("gauss"),), out_specs=P(),
            check_vma=False,
        )
    )
    c4, d4, a4 = fn(shard_gauss(gauss, mesh))

    lists = build_tile_lists(gauss, T, INTR, CFG, margin=3.0)
    tx0, ty0 = _tile_origins(INTR, CFG)
    c1, d1, a1 = render_tiles(gauss, T, INTR, CFG, lists, tx0, ty0)

    np.testing.assert_allclose(np.asarray(c4), np.asarray(c1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a4), np.asarray(a1), atol=1e-4)


def test_gp_map_grad_matches_replicated():
    """gp_map_loss_grad: the sharded per-device gradient blocks,
    concatenated in mesh order, must equal the full-map gradient of
    render()+mapping_loss on one device; the loss scalar must match; and
    no [N]-shaped cotangent is ever formed on a single device."""
    m = full_map()
    gauss = m.render_view()
    T = jnp.eye(4)
    key = jax.random.PRNGKey(3)
    gt_img = jnp.clip(
        render(gauss, T, INTR, CFG).image
        + 0.05 * jax.random.normal(key, (3, 64, 64)), 0, 1,
    )
    mask = jnp.ones((1, 64, 64))
    gt_t = tile_images(gt_img, INTR, CFG)
    mask_t = tile_images(mask, INTR, CFG)
    ea, eb = jnp.float32(1.05), jnp.float32(0.01)
    mesh = make_gauss_mesh(4)

    fn = jax.jit(
        jax.shard_map(
            lambda g: gp_map_loss_grad(
                g, T, INTR, CFG, gt_t, mask_t, ea, eb, margin=3.0,
            ),
            mesh=mesh,
            in_specs=(P("gauss"),),
            out_specs=(P(), (P("gauss"),) * 5, P(), P()),
            check_vma=False,
        )
    )
    loss4, g4, gea4, geb4 = fn(shard_gauss(gauss, mesh))

    lists = build_tile_lists(gauss, T, INTR, CFG, margin=3.0)

    def ref_loss(leaves, ea_, eb_):
        g = gauss._replace(
            xyz=leaves[0], sh=leaves[1], log_scale=leaves[2],
            quat=leaves[3], opa_logit=leaves[4],
        )
        out = render(g, T, INTR, CFG, lists=lists)
        return losses.mapping_loss_rgb(out.image, gt_img, mask, ea_, eb_)

    leaves = (gauss.xyz, gauss.sh, gauss.log_scale, gauss.quat,
              gauss.opa_logit)
    loss1, (g1, gea1, geb1) = jax.value_and_grad(
        ref_loss, argnums=(0, 1, 2)
    )(leaves, ea, eb)

    np.testing.assert_allclose(float(loss4), float(loss1), rtol=2e-5)
    # The blend has hard gates (alpha >= 1/255, transmittance >= 1e-4,
    # renderer._blend) and preprocess compiles at [N/D] vs [N] shapes, so a
    # gaussian sitting within an ulp of a gate can flip between the two
    # programs and its gradient jumps discontinuously. Allow a handful of
    # such boundary flips (bounded by one gaussian's local contribution);
    # everything else must agree tightly.
    n_loose = 0
    for a, b in zip(g4, g1):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        n_loose += int((d > 2e-5).sum())
        assert d.max() < 2e-3, f"gradient leg diverged: {d.max()}"
    assert n_loose <= 8, f"too many gate-boundary flips: {n_loose}"
    # the exposure-scalar gradients integrate the gate-flipped pixels too
    np.testing.assert_allclose(float(gea4), float(gea1), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(geb4), float(geb1), rtol=2e-3, atol=1e-4)
