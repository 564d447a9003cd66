"""Multi-chip scaling: device meshes + sharded mapping steps.

The reference is a single-GPU system whose only concurrency is the
frontend/backend process split (SURVEY.md section 2.3). The TPU-native
scale-out story is different and better-structured:

  - **view parallelism** (this module): mapping/bundle-adjustment renders B
    keyframes per iteration; shard the view batch over a `Mesh(("view",))`
    with shard_map — each chip renders its local views and the parameter
    gradient is a psum over ICI. The map is replicated (a few hundred MB).
  - **gaussian parallelism** (parallel/gauss.py): shard the [N] arrays
    themselves over a `Mesh(("gauss",))` axis — each chip preprocesses and
    bins its local shard, ONE all_gather exchanges the compacted per-tile
    survivor rows (the post-cull data volume, orders of magnitude below N),
    and a lexicographic merge reproduces the single-device strict-first
    lists. The scale-out story for maps beyond single-chip HBM.

The driver validates this path on a virtual 8-device CPU mesh via
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import gaussian_map as gm
from ..ops import losses, se3
from ..render import RenderConfig, render
from ..render.camera import Intrinsics
from ..slam.mapping import CamBatch, MapConfig, _gauss_view


def make_mesh(n_devices: int | None = None, axis: str = "view") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def sharded_map_step(
    m: gm.GaussianMap,
    cams: CamBatch,
    it_count,
    mesh: Mesh,
    intr: Intrinsics,
    cfg: RenderConfig,
    mcfg: MapConfig,
    hyper: gm.MapHyper,
):
    """One mapping iteration with the view batch sharded over the mesh.

    Per device: render local views, local loss + pose-tangent grads; map
    gradients are psum'd over ICI; the Adam step runs replicated. Returns
    (map', cams' with retracted poses, loss).
    """
    n_view = mesh.shape["view"]
    b = cams.T.shape[0]
    assert b % n_view == 0, (b, n_view)
    cfg = cfg._replace(with_n_touched=False)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("view")),
        out_specs=(P(), P("view"), P()),
    )
    def step(m_rep: gm.GaussianMap, cams_local: CamBatch):
        def loss_fn(params, taus, eas, ebs):
            gauss = _gauss_view(params, m_rep.active)

            def one(args):
                cam, tau, ea, eb = args
                out = render(gauss, cam.T, intr, cfg, tau=tau)
                if mcfg.monocular:
                    l = losses.mapping_loss_rgb(
                        out.image, cam.gt_image, cam.mapping_mask, ea, eb
                    )
                else:
                    l = losses.mapping_loss_rgbd(
                        out.image, out.depth, cam.gt_image, cam.gt_depth,
                        cam.mapping_mask, ea, eb, alpha=mcfg.alpha,
                    )
                return jnp.where(cam.valid, l, 0.0)

            per_view = jax.lax.map(one, (cams_local, taus, eas, ebs))
            total = jnp.sum(per_view)
            # isotropic regularizer once per device; divide by device count
            # so the psum'd total matches the single-device loss
            scaling = jnp.exp(params.log_scale)
            total = total + (
                mcfg.isotropic_weight
                * losses.isotropic_reg(scaling, m_rep.active)
                / n_view
            )
            return total

        bl = cams_local.T.shape[0]
        taus0 = jnp.zeros((bl, 6))
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            m_rep.params, taus0, cams_local.ea, cams_local.eb
        )
        g_params, g_tau, g_ea, g_eb = grads
        # map-parameter gradients reduce over the view axis (ICI psum);
        # pose/exposure gradients stay local to the owning device
        g_params = jax.lax.psum(g_params, "view")
        loss = jax.lax.psum(loss, "view")

        m2 = gm.adam_step(m_rep, g_params, hyper, step=it_count)

        # local keyframe pose/exposure SGD step (one iteration; outer loops
        # carry Adam state when used for real BA)
        lr8 = jnp.array(
            [mcfg.lr_trans] * 3 + [mcfg.lr_rot] * 3
            + [mcfg.lr_exposure_a, mcfg.lr_exposure_b]
        )
        g8 = jnp.concatenate([g_tau, g_ea[:, None], g_eb[:, None]], axis=-1)
        opt = jnp.concatenate(
            [jnp.tile(cams_local.opt_pose[:, None], (1, 6)),
             jnp.tile(cams_local.opt_exposure[:, None], (1, 2))], axis=-1,
        )
        d8 = jnp.where(opt, -lr8 * g8, 0.0)
        newT = jax.vmap(lambda T, d: se3.retract(T, d))(
            cams_local.T, d8[:, :6]
        )
        cams_out = cams_local._replace(
            T=newT, ea=cams_local.ea + d8[:, 6], eb=cams_local.eb + d8[:, 7]
        )
        return m2, cams_out, loss

    return step(m, cams)


def pad_cams(cams: CamBatch, n_view: int) -> CamBatch:
    """Pad the view batch to a multiple of the mesh size with invalid
    slots (masked out of every loss/stat by cams.valid)."""
    b = cams.T.shape[0]
    pad = (-b) % n_view
    if pad == 0:
        return cams
    from ..slam.mapping import empty_cam_batch

    h, w = cams.gt_image.shape[-2:]
    empty = empty_cam_batch(pad, h, w)
    return jax.tree.map(
        lambda a, e: jnp.concatenate([a, e], axis=0), cams, empty
    )


def sharded_map_iters(
    m: gm.GaussianMap,
    cams: CamBatch,
    n_iters,
    it_count,
    key,
    mesh: Mesh,
    intr: Intrinsics,
    cfg: RenderConfig,
    mcfg: MapConfig,
    hyper,
    kf_adam=None,
    initialization: bool = False,
):
    """The PRODUCTION fused mapping loop (slam.mapping.map_iters — dynamic
    trip count, Adam carry, frozen per-view lists, densify/prune/opacity
    resets) with the view batch sharded over the mesh's "view" axis.

    Same signature and return contract as map_iters (cams padded to a
    multiple of the mesh size; outputs sliced back). Map gradients and
    densify statistics psum/pmax over ICI inside the body
    (map_iters_impl(axis_name=...)); each device's replicated map update is
    identical because every cross-view reduction precedes it.
    """
    from ..slam.mapping import new_kf_adam

    n_view = mesh.shape["view"]
    b0 = cams.T.shape[0]
    cams = pad_cams(cams, n_view)
    b = cams.T.shape[0]
    if kf_adam is None:
        kf_adam = new_kf_adam(b)
    elif kf_adam[0].shape[0] != b:
        pad = b - kf_adam[0].shape[0]
        kf_adam = (
            jnp.pad(kf_adam[0], ((0, pad), (0, 0))),
            jnp.pad(kf_adam[1], ((0, pad), (0, 0))),
            kf_adam[2],
        )

    fn = _sharded_fn(mesh, intr, cfg, mcfg, hyper, initialization)
    m2, cams2, itc2, vis, ka2 = fn(
        m, cams, jnp.int32(n_iters), jnp.int32(it_count), key, kf_adam
    )
    sl = lambda x: x[:b0]
    return (
        m2,
        jax.tree.map(sl, cams2),
        itc2,
        vis[:b0],
        ka2 if b == b0 else (ka2[0][:b0], ka2[1][:b0], ka2[2]),
    )


@functools.lru_cache(maxsize=32)
def _sharded_fn(mesh, intr, cfg, mcfg, hyper, initialization):
    """Jitted shard_map'd map_iters body, cached per static config."""
    from ..slam.mapping import map_iters_impl

    n_view = mesh.shape["view"]
    # the isotropic regularizer is added once per device and its gradient
    # psum'd — pre-scale so the reduced total matches single-device
    mcfg_dev = mcfg._replace(
        isotropic_weight=mcfg.isotropic_weight / n_view
    )
    body = functools.partial(
        map_iters_impl,
        intr=intr, cfg=cfg, mcfg=mcfg_dev, hyper=hyper,
        initialization=initialization, axis_name="view",
    )
    fn = jax.shard_map(
        lambda m_, cams_, ni, itc, k, ka: body(
            m_, cams_, ni, itc, k, kf_adam=ka
        ),
        mesh=mesh,
        in_specs=(P(), P("view"), P(), P(), P(),
                  (P("view"), P("view"), P())),
        out_specs=(P(), P("view"), P(), P("view"),
                   (P("view"), P("view"), P())),
        check_vma=False,  # the replicated map update is identical across
                          # devices (all cross-view reductions precede it),
                          # but the static replication checker can't see
                          # through the densify lax.cond
    )
    return jax.jit(fn)


def replicate_map(m: gm.GaussianMap, mesh: Mesh) -> gm.GaussianMap:
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(m, sharding)


def shard_views(cams: CamBatch, mesh: Mesh) -> CamBatch:
    sharding = jax.sharding.NamedSharding(mesh, P("view"))
    return jax.device_put(cams, sharding)
