#!/usr/bin/env python
"""Stage-ablation timing of the tiled renderer on the real TPU.

Times, at the bench config (640x480, 100k gaussians), each prefix of the
render pipeline plus fwd+bwd variants, to locate the bottleneck stage.
Run WITHOUT env sanitization (the axon backend is the chip).
"""

import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402

monogs_tpu.enable_compilation_cache()
from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.render.primitives import preprocess  # noqa: E402
from monogs_tpu.render.renderer import _pack, _RAD, _U, _V  # noqa: E402
from monogs_tpu.render.tiling import compact_sort, macro_instance_bin  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96, macro_chunk=16)

scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
T = orbit_pose(0.01, trans_amp=0.8, rot_amp=0.15)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


def prefix(T, stop: str):
    """Re-implementation of render()'s index pipeline with early exits."""
    p = preprocess(scene.xyz, scene.log_scale, scene.quat, scene.opa_logit,
                   scene.sh, scene.active, T, intr, sh_degree=cfg.sh_degree,
                   near=cfg.near)
    order = jnp.argsort(jnp.where(p.valid, p.z, jnp.inf))
    packed = _pack(p)[order]
    valid_s = p.valid[order]
    if stop == "pack":
        return packed.sum()
    mpx = cfg.macro_px
    W, H = intr.width, intr.height
    n_mx, n_my = -(-W // mpx), -(-H // mpx)
    n_macro = n_mx * n_my
    u_s, v_s, rad_s = packed[:, _U], packed[:, _V], packed[:, _RAD]
    sel_m, vld_m = macro_instance_bin(
        u_s, v_s, rad_s, valid_s, n_mx, n_my, mpx,
        cfg.k_macro, cfg.span_cap, cfg.k_big)
    if stop == "macro":
        return sel_m.sum() + vld_m.sum()
    tile = cfg.tile
    ft = cfg.macro_tiles ** 2
    n_fine = n_macro * ft
    fx_off = (jnp.arange(ft, dtype=jnp.int32) % cfg.macro_tiles) * tile
    fy_off = (jnp.arange(ft, dtype=jnp.int32) // cfg.macro_tiles) * tile
    x0m = (jnp.arange(n_macro, dtype=jnp.int32) % n_mx * mpx).astype(jnp.float32)
    y0m = (jnp.arange(n_macro, dtype=jnp.int32) // n_mx * mpx).astype(jnp.float32)
    u_m, v_m, rad_m = u_s[sel_m], v_s[sel_m], rad_s[sel_m]
    tx0 = (x0m[:, None] + fx_off[None, :].astype(jnp.float32))
    ty0 = (y0m[:, None] + fy_off[None, :].astype(jnp.float32))
    fm = (
        vld_m[:, None, :]
        & (u_m[:, None, :] + rad_m[:, None, :] >= tx0[:, :, None])
        & (u_m[:, None, :] - rad_m[:, None, :] <= tx0[:, :, None] + tile - 1)
        & (v_m[:, None, :] + rad_m[:, None, :] >= ty0[:, :, None])
        & (v_m[:, None, :] - rad_m[:, None, :] <= ty0[:, :, None] + tile - 1)
    )
    if stop == "fmask":
        return fm.sum()
    sel_f, vld_f = jax.vmap(lambda m: compact_sort(m, cfg.k_fine))(
        fm.reshape(n_fine, cfg.k_macro))
    if stop == "fsort":
        return sel_f.sum() + vld_f.sum()
    sel_m_rep = jnp.broadcast_to(
        sel_m[:, None, :], (n_macro, ft, cfg.k_macro)).reshape(n_fine, cfg.k_macro)
    idx_g = jnp.take_along_axis(sel_m_rep, sel_f, axis=1)
    if stop == "fidx":
        return idx_g.sum()
    d = packed[idx_g]
    return d.sum()


for s in ("pack", "macro", "fmask", "fsort", "fidx", "gather"):
    timeit(f"prefix:{s}", jax.jit(functools_partial := (lambda T, s=s: prefix(T, s))), T)

cfg_nt = cfg._replace(with_n_touched=False)


@jax.jit
def s6_full(T):
    out = render(scene, T, intr, cfg_nt)
    return out.image.sum()


@jax.jit
def s7_full_nt(T):
    out = render(scene, T, intr, cfg)
    return out.image.sum()


@jax.jit
def g_tau(T):
    def loss(tau):
        out = render(scene, T, intr, cfg_nt, tau=tau)
        return jnp.sum(jnp.abs(out.image))
    return jax.grad(loss)(jnp.zeros(6))


@jax.jit
def g_map(T):
    def loss(xyz):
        out = render(scene._replace(xyz=xyz), T, intr, cfg_nt)
        return jnp.sum(jnp.abs(out.image))
    return jax.grad(loss)(scene.xyz)


timeit("full fwd (no n_touched)", s6_full, T)
timeit("full fwd (+n_touched)", s7_full_nt, T)
timeit("fwd+bwd wrt tau", g_tau, T, iters=10)
timeit("fwd+bwd wrt xyz", g_map, T, iters=10)
