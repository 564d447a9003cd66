"""Gaussian-parallel scale-out: shard the MAP over a mesh axis.

View parallelism (parallel/mesh.py) replicates the map and shards the
keyframe batch — it scales bundle adjustment across views but every chip
still holds (and preprocesses) all N gaussians. This module shards the
[N] gaussian arrays themselves over a `Mesh(("gauss",))` axis, which is
the scale-out story for maps beyond single-chip HBM (the reference has no
analogue; its rasterizer assumes the whole model on one GPU —
submodules/diff-gaussian-rasterization, SURVEY.md section 2.2).

Design (TPU-first, ICI-bound traffic only):

  1. Each device preprocesses + bins ONLY its local N/D shard
     (renderer.build_tile_lists — the per-device global sort is over
     N/D·span instances, so binning cost also divides by D).
  2. Each device gathers its local per-fine-tile survivor rows
     d_local [Tf, Kf, F] — the post-cull data volume, orders of magnitude
     below N (Tf·Kf·F·4B ≈ 7 MB at 640x480/k_fine 96).
  3. ONE all_gather of the survivor rows over ICI -> [D, Tf, Kf, F];
     per tile, the D local top-Kf lists are merged back to the global
     top-Kf by the same strict-first-then-depth rule the single-device
     binner uses (renderer._make_lists). Exactness: a tile's global
     top-Kf selection is contained in the union of its local top-Kf
     selections (each local list ranks a SUBSET of the global candidates
     by the same key, so any globally-selected row has local rank <=
     its global rank < Kf) — the merge is bit-identical to the
     single-device lists, not an approximation.
  4. The blend (and the fused mapping loss+grad kernel) runs on the
     merged rows exactly as on the single-device path.

Gradients: the merged rows are a (stop-gradient-indexed) gather of the
all_gathered local rows, so jax AD routes each row's cotangent back
through the all_gather transpose (psum_scatter over ICI) to the ONE
device that owns the gaussian — parameter gradients never materialize an
[N, ...] cotangent on any chip, and no cross-device scatter is needed.

Composes with view parallelism as a 2-D mesh ("view", "gauss"): shard
cams over "view" and the map over "gauss"; the all_gather rides the
"gauss" axis and the parameter-gradient psum the "view" axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import gaussian_map as gm
from ..render import RenderConfig, build_tile_lists
from ..render.camera import Intrinsics
from ..render.renderer import (
    GaussianArrays,
    TileLists,
    _F,
    _LOGO,
    _RAD,
    _U,
    _V,
    _Z,
    _pack,
    _pixel_basis,
    _tile_origins,
    preprocess,
)


def make_gauss_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("gauss",))


def shard_gauss(gauss: GaussianArrays, mesh: Mesh) -> GaussianArrays:
    """Place the map's SoA leaves sharded over the mesh's gauss axis
    (leading [N] dim). N must divide by the mesh size (fixed-capacity maps
    are powers of two; pad otherwise)."""
    sh = jax.sharding.NamedSharding(mesh, P("gauss"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), gauss)


def _local_rows(gauss: GaussianArrays, T_cw, intr, cfg, margin, tau=None):
    """Local shard's survivor rows: bin the local gaussians, then a
    DIFFERENTIABLE full-local-N preprocess + row gather (the same
    rows_fn contract as renderer.render_map_grad). Returns
    (d [Tf, Kf, F], vld [Tf, Kf])."""
    lists = build_tile_lists(gauss, T_cw, intr, cfg, margin=margin, tau=tau)
    prep = preprocess(
        gauss.xyz, gauss.log_scale, gauss.quat, gauss.opa_logit, gauss.sh,
        gauss.active, T_cw, intr, sh_degree=cfg.sh_degree, near=cfg.near,
    )
    packed = _pack(prep)
    d0 = packed[lists.idx]
    vld = lists.vld & prep.valid[lists.idx]
    logo = jnp.where(vld, d0[..., _LOGO], -1e30)
    d = jnp.concatenate(
        [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]], axis=-1
    )
    return d, vld


def _merge_rows(d_all, vld_all, tx0, ty0, tile: int, k_fine: int,
                margin: float):
    """Merge D per-device top-Kf survivor lists into the global top-Kf.

    d_all [Tf, D*Kf, F] (device-major concat of the all_gather), vld_all
    [Tf, D*Kf]. Reapplies the single-device selection rule: strict
    overlaps first (recomputed from each row's mean/STRICT radius vs the
    tile rect — margin rows carry the same packed radius, so strictness
    is decidable row-locally), depth order within each class, truncate at
    k_fine, then depth-sort the survivors. Sort keys are built under
    stop_gradient; the row gather stays differentiable."""
    g = jax.lax.stop_gradient
    z = g(d_all[..., _Z])
    u = g(d_all[..., _U])
    v = g(d_all[..., _V])
    r = g(d_all[..., _RAD])
    # Class: 0 strict overlap, 1 margin-only, 2 invalid. The selection is
    # a LEXICOGRAPHIC (class, depth) sort — adding a large class offset to
    # z in f32 would quantize depth to the offset's ulp (~0.06 at 1e6) and
    # scramble the blend order among margin rows.
    if margin:
        x1 = tx0[:, None] + (tile - 1)
        y1 = ty0[:, None] + (tile - 1)
        strict = (
            (u + r >= tx0[:, None]) & (u - r <= x1)
            & (v + r >= ty0[:, None]) & (v - r <= y1)
        )
        cls = jnp.where(strict, 0.0, 1.0)
    else:
        cls = jnp.zeros_like(z)
    cls = jnp.where(vld_all, cls, 2.0)
    iota = jnp.broadcast_to(
        jnp.arange(d_all.shape[1], dtype=jnp.int32)[None], cls.shape
    )
    cls_s, z_s, src = jax.lax.sort((cls, z, iota), dimension=1, num_keys=2)
    cls_k = cls_s[:, :k_fine]
    z_k = z_s[:, :k_fine]
    src_k = src[:, :k_fine]
    # depth order among survivors (the blend is front-to-back), invalid last
    zsel = jnp.where(cls_k < 2.0, z_k, jnp.inf)
    order = jnp.argsort(zsel, axis=1, stable=True)
    src_k = jnp.take_along_axis(src_k, order, axis=1)
    d = jnp.take_along_axis(d_all, src_k[..., None], axis=1)
    vld = jnp.take_along_axis(vld_all, src_k, axis=1)
    return d, vld, src_k


def gp_tile_rows(
    gauss_local: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float = 0.0,
    axis_name: str = "gauss",
    tau=None,
):
    """SPMD body: local shard -> merged global blend rows [Tf, Kf, F].

    Call inside shard_map over `axis_name` with gauss arrays sharded on
    N. The all_gather is the only cross-device exchange; its transpose
    (psum_scatter) routes row cotangents back to the owning shard."""
    d_l, vld_l = _local_rows(gauss_local, T_cw, intr, cfg, margin, tau=tau)
    d_all = jax.lax.all_gather(d_l, axis_name, axis=0, tiled=False)
    vld_all = jax.lax.all_gather(vld_l, axis_name, axis=0, tiled=False)
    dn, tf, kf, f = d_all.shape
    d_all = jnp.moveaxis(d_all, 0, 1).reshape(tf, dn * kf, f)
    vld_all = jnp.moveaxis(vld_all, 0, 1).reshape(tf, dn * kf)
    tx0, ty0 = _tile_origins(intr, cfg)
    d, vld, _ = _merge_rows(d_all, vld_all, tx0, ty0, cfg.tile,
                            cfg.k_fine, margin)
    return d, vld


def gp_render_tiles(
    gauss_local: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float = 0.0,
    axis_name: str = "gauss",
):
    """SPMD body: gaussian-parallel forward render in tile space.

    Returns (color [Tf, P, 3], depth [Tf, P], acc [Tf, P]) — identical to
    the single-device lists render of the full map (test_gauss_parallel).
    Runs the merged rows through the same per-tile blend the XLA backend
    uses; replicated across devices (tile-sharding the blend is the
    natural next cut — an all_to_all instead of the all_gather)."""
    from ..render.renderer import _blend

    d, vld = gp_tile_rows(gauss_local, T_cw, intr, cfg, margin, axis_name)
    tile = cfg.tile
    p = tile * tile
    px = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px, py)
    tx0, ty0 = _tile_origins(intr, cfg)
    W, H = intr.width, intr.height
    bg0 = jnp.zeros((3,), jnp.float32)

    def blend_tile(args):
        dt, vt, x0, y0 = args
        pix_ok = (x0 + px <= W - 1) & (y0 + py <= H - 1)
        color, depth, acc, _ = _blend(dt, vt, x0, y0, pmat, bg0, pix_ok)
        return color, depth, acc

    return jax.lax.map(blend_tile, (d, vld, tx0, ty0))


def gp_map_loss_grad(
    gauss_local: GaussianArrays,
    T_cw,
    intr: Intrinsics,
    cfg: RenderConfig,
    gt_t,
    mask_t,
    ea,
    eb,
    margin: float = 4.0,
    axis_name: str = "gauss",
    alpha: float = 1.0,
    gtd_t=None,
    initialization: bool = False,
):
    """SPMD body: one view's mapping loss + LOCAL-shard parameter
    gradients, gaussian-parallel.

    The loss matches ops/losses.mapping_loss_rgb[d] over the full map
    (replicated scalar); gradient leaves are [N/D]-shaped — each device
    receives exactly its own gaussians' gradients via the all_gather
    transpose, never an [N] buffer. Drop-in SPMD analogue of one
    render+loss+grad of slam.mapping's per-view chain; use under
    shard_map with P("gauss")-sharded leaves (tests/test_gauss_parallel)."""
    from ..ops.losses import mapping_loss_rgb, mapping_loss_rgbd
    from ..render.renderer import _blend

    tile = cfg.tile
    p = tile * tile
    px = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
    py = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
    pmat = _pixel_basis(px, py)
    tx0, ty0 = _tile_origins(intr, cfg)
    W, H = intr.width, intr.height
    bg0 = jnp.zeros((3,), jnp.float32)
    n_tiles = tx0.shape[0]
    mpx = cfg.macro_px
    n_mx = -(-W // mpx)
    ft = cfg.macro_tiles

    def assemble(x, c):
        # [Tf, P, C] tile space -> [C, H, W] image (renderer.render's
        # macro-major layout, cropped at the ragged edges)
        n_my = -(-H // mpx)
        x = x.reshape(n_my, n_mx, ft, ft, tile, tile, c)
        x = x.transpose(0, 2, 4, 1, 3, 5, 6)
        return x.reshape(n_my * mpx, n_mx * mpx, c)[:H, :W].transpose(
            2, 0, 1
        )

    def loss_fn(leaves, ea_, eb_):
        g2 = gauss_local._replace(
            xyz=leaves[0], sh=leaves[1], log_scale=leaves[2],
            quat=leaves[3], opa_logit=leaves[4],
        )
        d, vld = gp_tile_rows(g2, T_cw, intr, cfg, margin, axis_name)

        def blend_tile(args):
            dt, vt, x0, y0 = args
            pix_ok = (x0 + px <= W - 1) & (y0 + py <= H - 1)
            color, depth, acc, _ = _blend(dt, vt, x0, y0, pmat, bg0, pix_ok)
            return color, depth

        colors, depths = jax.lax.map(blend_tile, (d, vld, tx0, ty0))
        image = assemble(colors, 3)
        gt_img = assemble(gt_t, 3)
        mask = assemble(mask_t, 1)
        if gtd_t is None:
            return mapping_loss_rgb(image, gt_img, mask, ea_, eb_,
                                    initialization=initialization)
        depth_im = assemble(depths[..., None], 1)
        gt_dep = assemble(gtd_t, 1)
        return mapping_loss_rgbd(image, depth_im, gt_img, gt_dep, mask,
                                 ea_, eb_, alpha=alpha,
                                 initialization=initialization)

    leaves = (gauss_local.xyz, gauss_local.sh, gauss_local.log_scale,
              gauss_local.quat, gauss_local.opa_logit)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        leaves, ea, eb
    )
    g_leaves, g_ea, g_eb = grads
    # Every device runs the backward of the SAME replicated loss, and the
    # all_gather transpose (psum_scatter) SUMS their identical row
    # cotangents onto the owning shard — so the leaf gradients come out
    # scaled by the axis size. ea/eb gradients never cross the collective
    # (the merged rows are device-local) and are already exact.
    inv_d = 1.0 / jax.lax.psum(1.0, axis_name)
    g_leaves = jax.tree.map(lambda x: x * inv_d, g_leaves)
    return loss, g_leaves, g_ea, g_eb


def gp_adam_map_step(
    m_local: gm.GaussianMap,
    g_leaves: gm.ParamLeaves,
    hyper: gm.MapHyper,
    step,
) -> gm.GaussianMap:
    """Adam over the LOCAL shard only — gm.adam_step is elementwise over
    [N], so the sharded update needs no communication at all."""
    return gm.adam_step(m_local, gm.ParamLeaves(*g_leaves), hyper, step=step)
