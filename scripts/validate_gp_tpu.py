#!/usr/bin/env python
"""Compile + run the gauss-sharded mapping loop on the REAL chip
(VERDICT r4 #8a: the gp path had only ever run Pallas in interpret mode;
a 1-device ("gauss",) mesh on hardware compiles the same shard_map
program — all_gather merge, fused map-grad kernel, counts kernel —
through Mosaic).

Checks: 2 BA iterations + a tile_frac=0.5 variant + a densify-schedule
pass; asserts finite leaves and live visibility. Exit 0 = the gp kernels
compile and execute on TPU.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, "/root/repo")

import monogs_tpu  # noqa: E402
from monogs_tpu.utils.relay import ensure_live_backend  # noqa: E402

ensure_live_backend(fallback="error", roundtrip=False)
monogs_tpu.enable_compilation_cache()

from monogs_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from monogs_tpu.models import gaussian_map as gm  # noqa: E402
from monogs_tpu.models.gaussian_map import ParamLeaves  # noqa: E402
from monogs_tpu.ops import se3  # noqa: E402
from monogs_tpu.parallel.gauss_iters import gp_sharded_map_iters  # noqa: E402
from monogs_tpu.render import Intrinsics, RenderConfig, render  # noqa: E402
from monogs_tpu.slam.mapping import CamBatch, MapConfig  # noqa: E402

INTR = Intrinsics(fx=120.0, fy=120.0, cx=63.5, cy=47.5, width=128, height=96)
CFG = RenderConfig(tile=16, macro_tiles=2, k_macro=512, k_fine=96,
                   backend="pallas_lists", with_n_touched=True)
MCFG = MapConfig(monocular=True, window_size=2, pose_window=2,
                 bin_margin=4.0, fused_grad=True, vis_from_lists=True)

scene = make_synthetic_scene(jax.random.PRNGKey(0), n=2000, spread=1.5,
                             depth_mean=3.0, depth_spread=0.5)
cap = 4096
pad = cap - 2000
leaves = ParamLeaves(
    xyz=jnp.pad(scene.xyz, ((0, pad), (0, 0))),
    sh=jnp.pad(scene.sh, ((0, pad), (0, 0), (0, 0))),
    log_scale=jnp.pad(scene.log_scale, ((0, pad), (0, 0))),
    quat=jnp.pad(scene.quat, ((0, pad), (0, 0))),
    opa_logit=jnp.pad(scene.opa_logit, ((0, pad), (0, 0))),
)
m = gm.insert(gm.new_map(cap, sh_degree=0), leaves, jnp.int32(2000), kf_id=0)
gauss = m.render_view()
b = 3
Ts, gts = [], []
for i in range(b):
    tau = jnp.array([0.01, -0.005, 0.008, 0.004, -0.006, 0.003]) * i
    T = se3.retract(jnp.eye(4), tau)
    out = render(gauss, T, INTR, CFG._replace(with_n_touched=False))
    Ts.append(T)
    gts.append(jnp.clip(out.image, 0.0, 1.0))
h, w = INTR.height, INTR.width
cams = CamBatch(
    gt_image=jnp.stack(gts), gt_depth=jnp.zeros((b, 1, h, w)),
    mapping_mask=jnp.ones((b, 1, h, w)), T=jnp.stack(Ts),
    ea=jnp.ones((b,)), eb=jnp.zeros((b,)),
    valid=jnp.ones((b,), bool),
    opt_pose=jnp.array([False, True, True]),
    opt_exposure=jnp.array([False, True, True]),
)
mesh = Mesh(np.asarray(jax.devices()[:1]), ("gauss",))
hyper = gm.MapHyper()

for label, mcfg, iters in (
    ("base", MCFG, 2),
    ("tile_frac=0.5", MCFG._replace(tile_frac=0.5), 2),
    ("densify pass", MCFG._replace(gaussian_update_every=2,
                                   gaussian_update_offset=0,
                                   densify_grad_threshold=1e-9,
                                   clone_cap=16, split_cap=8), 3),
):
    out = gp_sharded_map_iters(
        m, cams, iters, 0, jax.random.PRNGKey(1), mesh,
        INTR, CFG, mcfg, hyper,
    )
    m2, cams2, it2, vis2, _ = out
    for name in ParamLeaves._fields:
        a = np.asarray(getattr(m2.params, name))
        assert np.isfinite(a).all(), (label, name)
    assert np.asarray(vis2).any(), label
    print(f"[gp-tpu] {label:<16} OK  (it={int(it2)}, "
          f"active={int(np.asarray(m2.active).sum())})", flush=True)
print("[gp-tpu] ALL OK — gp kernels compiled and ran on hardware",
      flush=True)
