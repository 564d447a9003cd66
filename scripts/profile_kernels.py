#!/usr/bin/env python
"""Stage-level timings of the tracking hot path on the real TPU.

Times each component of a tracking frame in isolation (median of `reps`
steady-state calls; remote axon dispatch adds ~3 ms/call — the `null
dispatch` line measures it so kernel times can be read net of it).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402

monogs_tpu.enable_compilation_cache()
from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.render.renderer import (  # noqa: E402
    TileLists,
    _tile_origins,
    build_tile_lists,
    refine_fine_lists,
    render_pose_jvp_tiles,
    render_tiles,
    tile_images,
)
from monogs_tpu.slam.frame import make_frame_data  # noqa: E402

intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                   macro_chunk=16, backend="pallas_lists",
                   with_n_touched=False)

scene = make_synthetic_scene(
    jax.random.PRNGKey(0), n=100_000, spread=2.2, depth_mean=3.0,
    depth_spread=0.8, scale_min=0.015, scale_max=0.05,
)
T0 = orbit_pose(0.0, trans_amp=0.8, rot_amp=0.15)
T1 = orbit_pose(1 / 400.0, trans_amp=0.8, rot_amp=0.15)
img = jnp.clip(render(scene, T1, intr, cfg).image, 0, 1)
frame = make_frame_data(img, None, 1.1, 0.01, "tum")


def timeit(name, f, reps=10):
    out = f()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2] * 1000
    print(f"{name:42s} {med:8.2f} ms", flush=True)
    return med


null = jax.jit(lambda x: x + 1.0)
timeit("null dispatch (jit x+1)", lambda: null(jnp.float32(1.0)))

# ------------- binning -------------
blj = jax.jit(lambda T: build_tile_lists(scene, T, intr, cfg, margin=8.0))
timeit("build_tile_lists(margin=8)", lambda: blj(T0))
blja = jax.jit(
    lambda T: build_tile_lists(scene, T, intr, cfg, margin=8.0, with_aux=True)
)
lists, aux = blja(T0)
timeit("build_tile_lists(margin=8, with_aux)", lambda: blja(T0))
ble = jax.jit(lambda T: build_tile_lists(scene, T, intr, cfg))
timeit("build_tile_lists(exact)", lambda: ble(T0))

tx0f, ty0f = _tile_origins(intr, cfg)
n_fine = tx0f.shape[0]
n_sub = max(8, int(n_fine * 0.25) // 8 * 8)
tsel = jax.random.permutation(jax.random.PRNGKey(5), n_fine)[:n_sub]
print(f"[info] n_fine={n_fine} n_sub={n_sub}")

rffj = jax.jit(lambda T: refine_fine_lists(scene, T, intr, cfg, aux, tsel))
timeit("refine_fine_lists (subset)", lambda: rffj(T0))
tall = jnp.arange(n_fine, dtype=jnp.int32)
rfaj = jax.jit(lambda T: refine_fine_lists(scene, T, intr, cfg, aux, tall))
timeit("refine_fine_lists (all tiles)", lambda: rfaj(T0))

# ------------- fo-iteration pieces -------------
lists_sub = TileLists(idx=lists.idx[tsel], vld=lists.vld[tsel])
txs, tys = tx0f[tsel], ty0f[tsel]
gt_t = tile_images(frame.gt_image, intr, cfg)[tsel]
mask_t = tile_images(frame.mapping_mask, intr, cfg)[tsel]

rtj = jax.jit(
    lambda T, tau: render_tiles(scene, T, intr, cfg, lists_sub, txs, tys,
                                tau=tau)
)
z6 = jnp.zeros(6)
timeit("render_tiles fwd (subset)", lambda: rtj(T0, z6))


def fo_loss(tau):
    col, dep, acc = render_tiles(scene, T0, intr, cfg, lists_sub, txs, tys,
                                 tau=tau)
    r = acc[..., None] * mask_t * ((1.0 * col + 0.0) - gt_t)
    return jnp.sum(jnp.abs(r))


foj = jax.jit(jax.grad(fo_loss))
timeit("fo iter: render_tiles + VJP", lambda: foj(z6))

# ------------- so-iteration pieces -------------
jvpj = jax.jit(
    lambda T: render_pose_jvp_tiles(scene, T, intr, cfg, lists_sub, txs, tys)
)
timeit("render_pose_jvp_tiles (jvp8 kernel)", lambda: jvpj(T0))


def so_full(T):
    from monogs_tpu.ops.sketch import make_sketch
    from monogs_tpu.slam.tracking import TrackConfig, _so_fast_step

    tcfg = TrackConfig(monocular=True)
    sketch = make_sketch(jax.random.PRNGKey(0), n_sub * 256, 16, 64)
    return _so_fast_step(scene, gt_t, mask_t, T, jnp.float32(1.0),
                         jnp.float32(0.0), sketch, intr, cfg, tcfg,
                         lists_sub, txs, tys, scale=float(n_fine / n_sub))


soj = jax.jit(so_full)
timeit("so iter: _so_fast_step (no refine)", lambda: soj(T0))

# ------------- final render -------------
cfg_nt = cfg._replace(with_n_touched=True, backend="xla")
frj = jax.jit(lambda T: render(scene, T, intr, cfg_nt))
timeit("final render XLA + n_touched", lambda: frj(T0))
frp = jax.jit(lambda T: render(scene, T, intr, cfg))
timeit("full render pallas (no n_touched)", lambda: frp(T0))
try:
    cfg_pnt = cfg._replace(with_n_touched=True)
    frpn = jax.jit(lambda T: render(scene, T, intr, cfg_pnt))
    out = frpn(T0)
    if int(jnp.sum(out.n_touched)) > 0:
        timeit("full render pallas + n_touched", lambda: frpn(T0))
except Exception as e:
    print(f"[info] pallas n_touched path unavailable: {e}")
