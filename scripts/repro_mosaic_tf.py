#!/usr/bin/env python
"""Repro: Mosaic relayout compile failure at tile_frac < 1.0, 320x240.

sweep_slam.py's tf50 variant died in the warmup SLAM compile with
  Mosaic failed to compile TPU kernel: Invalid relayout: Non-singleton
  logical dimension is replicated in destination but not in source for
  'vector<1x256xf32>': "32,{0,*},(8,128),-1" -> "32,{0,*},(8,128)"
This compiles the tracking program at exactly that config, one phase at
a time, to localize the kernel.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=False)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.frame import FrameData  # noqa: E402
from monogs_tpu.slam.tracking import TrackConfig, track_frame  # noqa: E402

intr = Intrinsics(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                  width=320, height=240)
cfg = RenderConfig(tile=16, macro_tiles=4, k_macro=4096, k_fine=128,
                   backend="pallas_lists", with_n_touched=False)
scene = make_synthetic_scene(jax.random.PRNGKey(0), n=8192)
T = jnp.eye(4)
out = jax.jit(lambda: render(scene, T, intr, cfg))()
gt = jnp.clip(out.image, 0, 1)
gtd = out.depth
jax.block_until_ready(gt)
print("[repro] scene rendered", flush=True)

frame = FrameData(
    gt_image=gt,
    gt_depth=gtd,
    has_depth=jnp.bool_(True),
    track_mask=jnp.ones((1, 240, 320)),
    mapping_mask=jnp.ones((1, 240, 320)),
)
base = dict(monocular=False, bin_margin=8.0, stack_dim=4, sketch_dim=64)
for label, kw in [
    ("fo_only tf=0.5", dict(fo_max_iter=5, so_max_iter=0,
                            fo_tile_frac=0.5, so_tile_frac=1.0)),
    ("so_only tf=0.5", dict(fo_max_iter=0, so_max_iter=2,
                            fo_tile_frac=1.0, so_tile_frac=0.5)),
    ("both tf=1.0", dict(fo_max_iter=5, so_max_iter=2,
                         fo_tile_frac=1.0, so_tile_frac=1.0)),
]:
    tcfg = TrackConfig(**base, **kw)
    try:
        res = track_frame(
            scene, frame, T, jnp.float32(1.0), jnp.float32(0.0),
            jax.random.PRNGKey(1), intr, cfg, tcfg,
        )
        jax.block_until_ready(res[0])
        print(f"[repro] {label}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:300]
        print(f"[repro] {label}: FAIL {type(e).__name__}: {msg}",
              flush=True)
