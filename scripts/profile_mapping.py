#!/usr/bin/env python
"""Decompose the mapping BA iteration cost on TPU hardware.

The round-3 fused mapping kernel moved the BA rate only 6.68 -> 6.72
iters/s: mapping is NOT blend-bound. This measures where the ~150 ms/iter
actually goes, by timing nested prefixes of the per-iteration work (each
piece repeated R times inside ONE jitted lax.scan so the ~30-50 ms relay
sync amortizes away; costs are reported as (t[R] - t[1]) / (R - 1) deltas,
the only attribution that works through the axon relay — CLAUDE.md).

Pieces (10-view window, 640x480, 131k capacity, k_fine 96 lists):
  preprocess   full-N preprocess + pack, all views
  +gather      ... + the [Tf*Kf] row gather packed[lists.idx]
  +blend       ... + the fused blend/L1/reverse-blend kernel
  +pullback    ... + the VJP back through gather (scatter-add) + preprocess
  full iter    one complete map_iters iteration (lists frozen)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=True)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.models import gaussian_map as gm  # noqa: E402
from monogs_tpu.render import (  # noqa: E402
    Intrinsics, RenderConfig, build_tile_lists, render,
)
from monogs_tpu.render.renderer import (  # noqa: E402
    _pack, _pixel_basis, _tile_origins, preprocess, render_map_grad,
    tile_images, TileLists,
)
from monogs_tpu.render.pallas_lists import map_grad_lists_pallas  # noqa: E402
from monogs_tpu.slam.mapping import CamBatch, MapConfig, map_iters  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                  width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists",
                   with_n_touched=False)
scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
rj = jax.jit(lambda T: render(scene, T, intr, cfg))
frames, poses = [], []
for i in range(10):
    T = orbit_pose(i / 400.0, trans_amp=0.8, rot_amp=0.15)
    frames.append(jnp.clip(rj(T).image, 0, 1))
    poses.append(T)
jax.block_until_ready(frames[-1])

n = scene.xyz.shape[0]
cap = 1 << 17
pad = cap - n
leaves = gm.ParamLeaves(
    xyz=jnp.pad(scene.xyz, ((0, pad), (0, 0))),
    sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
    log_scale=jnp.pad(scene.log_scale, ((0, pad), (0, 0))),
    quat=jnp.pad(scene.quat, ((0, pad), (0, 0))),
    opa_logit=jnp.pad(scene.opa_logit, ((0, pad), (0, 0))),
)
m0 = gm.insert(gm.new_map(cap), leaves, jnp.int32(n), kf_id=0)
gauss = m0.render_view()
b = 10
Ts = jnp.stack(poses)

lists = [build_tile_lists(gauss, poses[i], intr, cfg, margin=4.0)
         for i in range(b)]
l_idx = jnp.stack([l.idx for l in lists])
l_vld = jnp.stack([l.vld for l in lists])
gt_tb = jnp.stack([tile_images(f, intr, cfg) for f in frames])
mask_tb = jnp.stack(
    [tile_images(jnp.ones((1, intr.height, intr.width)), intr, cfg)] * b
)
tile = cfg.tile
p = tile * tile
px = (jnp.arange(p, dtype=jnp.int32) % tile).astype(jnp.float32)
py = (jnp.arange(p, dtype=jnp.int32) // tile).astype(jnp.float32)
pmat = _pixel_basis(px, py)
tx0, ty0 = _tile_origins(intr, cfg)

_LOGO = 11  # packed log-opacity column (renderer._LOGO)


def rows_one(params, T_v, li, lv):
    prep = preprocess(
        params.xyz, params.log_scale, params.quat, params.opa_logit,
        params.sh, m0.active, T_v, intr, sh_degree=cfg.sh_degree,
        near=cfg.near,
    )
    packed = _pack(prep)
    d0 = packed[li]
    vld_f = lv & prep.valid[li]
    logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
    return jnp.concatenate(
        [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]], axis=-1
    )


def pre_only(params):
    def one(args):
        T_v, li = args
        prep = preprocess(
            params.xyz, params.log_scale, params.quat, params.opa_logit,
            params.sh, m0.active, T_v, intr, sh_degree=cfg.sh_degree,
            near=cfg.near,
        )
        return jnp.sum(_pack(prep)) + jnp.float32(jnp.sum(li) * 0)
    return jnp.sum(jax.lax.map(one, (Ts, l_idx)))


def pre_gather(params):
    def one(args):
        T_v, li, lv = args
        return jnp.sum(rows_one(params, T_v, li, lv))
    return jnp.sum(jax.lax.map(one, (Ts, l_idx, l_vld)))


def pre_gather_blend(params):
    def one(args):
        T_v, li, lv, gt_t, mask_t = args
        d = rows_one(params, T_v, li, lv)
        dd, sums = map_grad_lists_pallas(
            d, tx0, ty0, pmat, gt_t, mask_t, jnp.float32(1.0),
            jnp.float32(0.0), tile, intr.width, intr.height,
            False, True, 1.0, 1e-6,
        )
        return jnp.sum(dd) + jnp.sum(sums)
    return jnp.sum(jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb)))


def full_grad(params):
    def one(args):
        T_v, li, lv, gt_t, mask_t = args
        loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii = render_map_grad(
            gauss._replace(
                xyz=params.xyz, sh=params.sh, log_scale=params.log_scale,
                quat=params.quat, opa_logit=params.opa_logit,
            ),
            T_v, intr, cfg, TileLists(idx=li, vld=lv), gt_t, mask_t,
            jnp.zeros(6), jnp.zeros((cap, 2)), jnp.float32(1.0),
            jnp.float32(0.0), False, 1.0,
        )
        return (loss, g_leaves)
    losses, gl = jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb))
    return jnp.sum(losses) + sum(jnp.sum(g) for g in jax.tree.leaves(gl))


def timed_scan(fn, label, reps=(1, 6)):
    outs = {}
    for r in reps:
        def body(carry, _):
            eps = carry * 1e-30
            params = m0.params._replace(xyz=m0.params.xyz + eps)
            return carry + fn(params), None

        prog = jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=r)[0]
        )
        out = prog()
        jax.block_until_ready(out)  # compile
        t0 = time.time()
        out = prog()
        jax.block_until_ready(out)
        outs[r] = time.time() - t0
    r0, r1 = reps
    per = (outs[r1] - outs[r0]) / (r1 - r0) * 1000
    print(f"[prof-map] {label:<28} {per:8.2f} ms/iter "
          f"(t1 {outs[r0]*1000:.1f} ms, t{r1} {outs[r1]*1000:.1f} ms)",
          flush=True)
    return per


timed_scan(pre_only, "preprocess+pack (10 views)")
timed_scan(pre_gather, "+ row gather")
timed_scan(pre_gather_blend, "+ fused blend kernel")
timed_scan(full_grad, "+ VJP pullback (scatter)")

# reference: the real full iteration
mcfg = MapConfig(monocular=True, window_size=8, pose_window=5)
cams = CamBatch(
    gt_image=jnp.stack(frames),
    gt_depth=jnp.zeros((b, 1, intr.height, intr.width)),
    mapping_mask=jnp.ones((b, 1, intr.height, intr.width)),
    T=Ts, ea=jnp.ones((b,)), eb=jnp.zeros((b,)),
    valid=jnp.ones((b,), bool),
    opt_pose=jnp.array([False] + [True] * 4 + [False] * 5),
    opt_exposure=jnp.array([False] + [True] * (b - 1)),
)
hyper = gm.MapHyper()


def run(iters):
    out = map_iters(m0, cams, iters, jnp.int32(100),
                    jax.random.PRNGKey(0), intr, cfg, mcfg, hyper)
    jax.block_until_ready(out[0].params.xyz)
    return out


run(1)
t0 = time.time()
run(30)
dt = (time.time() - t0) / 30 * 1000
print(f"[prof-map] {'full map_iters iteration':<28} {dt:8.2f} ms/iter",
      flush=True)


# ---- round-5: the tile-subset (MapConfig.tile_frac) iteration floor ----
# ab_tile_frac.py measured cost ~ 67 ms fixed + 71 ms x frac: at the
# shipped 0.25 the ROWS are no longer the wall. These prefixes rerun the
# decomposition with a fixed 1/4 tile subset to locate the floor.
S_SUB = (l_idx.shape[1] // 4) // 8 * 8
tsel = jax.random.permutation(jax.random.PRNGKey(5), l_idx.shape[1])[:S_SUB]
tsel_b = jnp.tile(tsel[None], (b, 1))
sub_frac = S_SUB / l_idx.shape[1]


def pre_only_sub(params):
    # identical full-N preprocess; the subset only changes downstream legs
    return pre_only(params)


def pre_gather_sub(params):
    def one(args):
        T_v, li, lv, ts = args
        return jnp.sum(rows_one(params, T_v, li[ts], lv[ts]))
    return jnp.sum(jax.lax.map(one, (Ts, l_idx, l_vld, tsel_b)))


def pre_gather_blend_sub(params):
    def one(args):
        T_v, li, lv, gt_t, mask_t, ts = args
        d = rows_one(params, T_v, li[ts], lv[ts])
        dd, sums = map_grad_lists_pallas(
            d, tx0[ts], ty0[ts], pmat, gt_t[ts], mask_t[ts],
            jnp.float32(1.0), jnp.float32(0.0), tile, intr.width,
            intr.height, False, True, 1.0, 1e-6, px_frac=sub_frac,
        )
        return jnp.sum(dd) + jnp.sum(sums)
    return jnp.sum(jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb,
                                     tsel_b)))


def full_grad_sub(params):
    def one(args):
        T_v, li, lv, gt_t, mask_t, ts = args
        loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii = render_map_grad(
            gauss._replace(
                xyz=params.xyz, sh=params.sh, log_scale=params.log_scale,
                quat=params.quat, opa_logit=params.opa_logit,
            ),
            T_v, intr, cfg, TileLists(idx=li[ts], vld=lv[ts]),
            gt_t[ts], mask_t[ts],
            jnp.zeros(6), jnp.zeros((cap, 2)), jnp.float32(1.0),
            jnp.float32(0.0), False, 1.0,
            txy=(tx0[ts], ty0[ts]), px_frac=sub_frac,
        )
        return (loss, g_leaves)
    losses, gl = jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb,
                                   tsel_b))
    return jnp.sum(losses) + sum(jnp.sum(g) for g in jax.tree.leaves(gl))


def grad_no_offs_sub(params):
    # same as full_grad_sub but WITHOUT the means2d_offset hook: its
    # cotangent is a dense [N, 2] per view that exists only for densify
    # stats — measuring its share of the floor
    def one(args):
        T_v, li, lv, gt_t, mask_t, ts = args
        def rows_fn(xyz, sh, ls, quat, ol):
            prep = preprocess(
                xyz, ls, quat, ol, sh, m0.active, T_v, intr,
                sh_degree=cfg.sh_degree, near=cfg.near,
            )
            packed = _pack(prep)
            d0 = packed[li[ts]]
            vld_f = lv[ts] & prep.valid[li[ts]]
            logo = jnp.where(vld_f, d0[..., _LOGO], -1e30)
            return jnp.concatenate(
                [d0[..., :_LOGO], logo[..., None], d0[..., _LOGO + 1:]],
                axis=-1,
            )
        d, pull = jax.vjp(rows_fn, params.xyz, params.sh,
                          params.log_scale, params.quat, params.opa_logit)
        dd, sums = map_grad_lists_pallas(
            d, tx0[ts], ty0[ts], pmat, gt_t[ts], mask_t[ts],
            jnp.float32(1.0), jnp.float32(0.0), tile, intr.width,
            intr.height, False, True, 1.0, 1e-6, px_frac=sub_frac,
        )
        return sum(jnp.sum(g) for g in pull(dd)) + jnp.sum(sums)
    return jnp.sum(jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb,
                                     tsel_b)))


print(f"[prof-map] ---- subset frac {sub_frac:.3f} ({S_SUB} tiles) ----",
      flush=True)
timed_scan(pre_gather_sub, "sub: + row gather")
timed_scan(pre_gather_blend_sub, "sub: + fused blend kernel")
timed_scan(grad_no_offs_sub, "sub: + pullback, NO offs hook")
timed_scan(full_grad_sub, "sub: + full pullback")


def full_grad_sub_gf(params):
    # gather-first variant (render_map_grad gather_first=True)
    def one(args):
        T_v, li, lv, gt_t, mask_t, ts = args
        loss, g_leaves, g_tau, g_off, g_ea, g_eb, radii = render_map_grad(
            gauss._replace(
                xyz=params.xyz, sh=params.sh, log_scale=params.log_scale,
                quat=params.quat, opa_logit=params.opa_logit,
            ),
            T_v, intr, cfg, TileLists(idx=li[ts], vld=lv[ts]),
            gt_t[ts], mask_t[ts],
            jnp.zeros(6), jnp.zeros((cap, 2)), jnp.float32(1.0),
            jnp.float32(0.0), False, 1.0,
            txy=(tx0[ts], ty0[ts]), px_frac=sub_frac, gather_first=True,
        )
        return (loss, g_leaves)
    losses, gl = jax.lax.map(one, (Ts, l_idx, l_vld, gt_tb, mask_tb,
                                   tsel_b))
    return jnp.sum(losses) + sum(jnp.sum(g) for g in jax.tree.leaves(gl))


timed_scan(full_grad_sub_gf, "sub: full pullback GATHER-FIRST")
