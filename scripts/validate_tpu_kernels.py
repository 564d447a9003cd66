"""One-shot TPU (Mosaic) validation of the round-2 Pallas kernels.

The round-2 kernels (fused fo loss+grad `_fo_grad_kernel`, n_touched counts
`_fwd_counts_kernel`) are CPU-interpret-tested, but Mosaic is stricter than
the interpreter and the TPU relay died mid-round-2 before they could be
compiled on hardware. Run this the moment the relay returns (probe with
`bash -c 'echo > /dev/tcp/127.0.0.1/8082'`): it compiles and times each
kernel at the BENCH shapes (640x480, k_fine=96, tile 16) and cross-checks
numerics against the Mosaic-proven plain blend + XLA autodiff, then runs one
full `track_frame` at the bench config.

Exit code 0 = every round-2 kernel is Mosaic-clean at bench shapes (the
bench.py fallback tiers will not trigger). Each section prints PASS/FAIL so
a single bad kernel doesn't mask the others.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import monogs_tpu
from monogs_tpu.utils.relay import ensure_live_backend

# hardware validation is pointless without the relay: fail fast, don't hang
ensure_live_backend(fallback="cpu" if "--small" in sys.argv else "error",
                    roundtrip="--small" not in sys.argv)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene, orbit_pose
from monogs_tpu.render import Intrinsics, RenderConfig, build_tile_lists, render
from monogs_tpu.render.renderer import (
    TileLists,
    _tile_origins,
    render_fo_grad_tiles,
    tile_images,
    tile_rows,
)
from monogs_tpu.slam.frame import make_frame_data
from monogs_tpu.slam.tracking import TrackConfig, track_frame

SMALL = "--small" in sys.argv  # CPU smoke test of the script itself
                               # (interpret mode, tiny shapes)
if SMALL:
    INTR = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5,
                      width=128, height=96)
    CFG = RenderConfig(tile=16, macro_tiles=4, k_macro=512, k_fine=96,
                       backend="pallas_lists", pallas_interpret=True)
    N_GAUSS, N_SUB, FO_TIMED, TRACK_TIMED = 4000, 8, 1, 1
else:
    INTR = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                      width=640, height=480)
    CFG = RenderConfig(tile=16, macro_tiles=4, k_macro=1024, k_fine=96,
                       macro_chunk=16, backend="pallas_lists")
    N_GAUSS, N_SUB, FO_TIMED, TRACK_TIMED = 100_000, 304, 20, 5

failures = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[tpu-validate] PASS {name} ({time.time()-t0:.1f}s)",
              flush=True)
    except Exception as e:
        failures.append(name)
        print(f"[tpu-validate] FAIL {name}: {type(e).__name__}: {e}",
              flush=True)


def main():
    print(f"[tpu-validate] backend: {jax.default_backend()}, "
          f"devices: {jax.devices()}", flush=True)
    scene = make_synthetic_scene(jax.random.PRNGKey(0), n=N_GAUSS, spread=2.2,
                                 depth_mean=3.0, depth_spread=0.8,
                                 scale_min=0.015, scale_max=0.05)
    T = orbit_pose(0.01, trans_amp=0.8, rot_amp=0.15)
    gt = jnp.clip(render(scene, orbit_pose(0.012, trans_amp=0.8,
                                           rot_amp=0.15), INTR,
                         CFG._replace(with_n_touched=False)).image, 0, 1)

    # --- counts kernel (with_n_touched on the pallas_lists path) ---------
    def counts():
        out = jax.jit(lambda t: render(scene, t, INTR, CFG))(T)
        jax.block_until_ready(out.n_touched)
        ref = jax.jit(
            lambda t: render(scene, t, INTR, CFG._replace(backend="xla"))
        )(T)
        # binning is identical; counts must agree on the overlap test
        a = np.asarray(out.n_touched)
        b = np.asarray(ref.n_touched)
        frac = np.mean(np.abs(a - b) <= np.maximum(2, 0.05 * b))
        assert frac > 0.98, f"n_touched mismatch frac {1-frac:.3f}"

    check("counts kernel (n_touched)", counts)

    # --- fused fo kernel vs XLA autodiff over tile_rows -------------------
    def fo_fused():
        cfg_t = CFG._replace(with_n_touched=False)
        lists = build_tile_lists(scene, T, INTR, cfg_t, margin=8.0)
        tx0, ty0 = _tile_origins(INTR, cfg_t)
        n_fine = tx0.shape[0]
        sel = jax.random.permutation(jax.random.PRNGKey(1), n_fine)[:N_SUB]
        sub = TileLists(idx=lists.idx[sel], vld=lists.vld[sel])
        gt_t = tile_images(gt, INTR, cfg_t)[sel]
        mask = tile_images(jnp.ones((1,) + gt.shape[1:]), INTR, cfg_t)[sel]
        tau = jnp.zeros(6)

        f = jax.jit(lambda t: render_fo_grad_tiles(
            scene, T, INTR, cfg_t, sub, tx0[sel], ty0[sel], t,
            jnp.float32(1.1), jnp.float32(0.01), gt_t, mask, True, 0.01,
        ))
        loss, l1, g8 = f(tau)
        jax.block_until_ready(g8)
        t0 = time.time()
        for _ in range(FO_TIMED):
            loss, l1, g8 = f(tau)
        jax.block_until_ready(g8)
        print(f"[tpu-validate]   fo_fused step: "
              f"{(time.time()-t0)/FO_TIMED*1000:.2f} ms", flush=True)

        # reference value through the plain (Mosaic-proven) blend + AD
        from monogs_tpu.slam.tracking import _fo_loss_tiles

        tcfg = TrackConfig()
        p8 = jnp.concatenate([tau, jnp.float32(1.1)[None],
                              jnp.float32(0.01)[None]])
        (loss_ref, l1_ref), g_ref = jax.jit(jax.value_and_grad(
            lambda p: _fo_loss_tiles(scene, T, p, INTR, cfg_t, tcfg, sub,
                                     tx0[sel], ty0[sel], gt_t, mask, None,
                                     1.0),
            has_aux=True,
        ))(p8)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
        np.testing.assert_allclose(float(l1), float(l1_ref), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(g8), np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-5)

    check("fused fo loss+grad kernel", fo_fused)

    # --- full bench-config track_frame (all kernels in one program) ------
    def full_track():
        tcfg = TrackConfig(monocular=True, fo_max_iter=40 if not SMALL else 5, so_max_iter=10 if not SMALL else 2,
                           stack_dim=16, sketch_dim=64, bin_margin=8.0,
                           fo_tile_frac=0.25, so_tile_frac=0.25,
                           rebin_so_iters=3)
        frame = make_frame_data(gt, None, 1.1, 0.01, "tum")
        res = track_frame(scene, frame, T, jnp.float32(1.0),
                          jnp.float32(0.0), jax.random.PRNGKey(0), INTR,
                          CFG, tcfg)
        jax.block_until_ready(res.T)
        t0 = time.time()
        for i in range(TRACK_TIMED):
            res = track_frame(scene, frame, T, jnp.float32(1.0),
                              jnp.float32(0.0), jax.random.PRNGKey(i), INTR,
                              CFG, tcfg)
            jax.block_until_ready(res.T)
        print(f"[tpu-validate]   track_frame: "
              f"{(time.time()-t0)/TRACK_TIMED*1000:.1f} ms/frame (serial sync)",
              flush=True)
        assert np.isfinite(float(res.last_l1))

    check("bench-config track_frame", full_track)

    # --- k_fine=512 chunked kernels (round-3: K-chunk carries removed the
    # scoped-VMEM ceiling; this is the gate for deleting the
    # _TRACK_K_FINE_VMEM_CAP clamp) -------------------------------------
    def kf512_track():
        cfg512 = CFG._replace(k_fine=512 if not SMALL else 32)
        tcfg = TrackConfig(monocular=True,
                           fo_max_iter=10 if not SMALL else 2,
                           so_max_iter=4 if not SMALL else 1,
                           stack_dim=16, sketch_dim=64, bin_margin=8.0,
                           fo_tile_frac=0.25, so_tile_frac=0.25,
                           rebin_so_iters=2)
        frame = make_frame_data(gt, None, 1.1, 0.01, "tum")
        res = track_frame(scene, frame, T, jnp.float32(1.0),
                          jnp.float32(0.0), jax.random.PRNGKey(0), INTR,
                          cfg512, tcfg)
        jax.block_until_ready(res.T)
        t0 = time.time()
        n = max(TRACK_TIMED // 2, 1)
        for i in range(n):
            res = track_frame(scene, frame, T, jnp.float32(1.0),
                              jnp.float32(0.0), jax.random.PRNGKey(i), INTR,
                              cfg512, tcfg)
            jax.block_until_ready(res.T)
        print(f"[tpu-validate]   kf512 track_frame (fo10/so4): "
              f"{(time.time()-t0)/n*1000:.1f} ms/frame", flush=True)
        assert np.isfinite(float(res.last_l1))

    check("k_fine=512 chunked track_frame", kf512_track)

    if failures:
        print(f"[tpu-validate] FAILURES: {failures}", flush=True)
        sys.exit(1)
    print("[tpu-validate] all round-2 kernels Mosaic-clean", flush=True)


if __name__ == "__main__":
    main()
