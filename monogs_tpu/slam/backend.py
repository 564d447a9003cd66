"""Mapping backend: message loop + keyframe-window optimization driver.

Mirrors BackEnd (/root/reference/utils/slam_backend.py) — the message
vocabulary (init / keyframe / pause / unpause / color_refinement / stop),
idle continuous mapping in multiprocess mode, keyframe insertion, the
init-BA schedule, covisibility pruning, and push_to_frontend — but runs as a
host thread driving jitted device programs over an immutable fixed-capacity
map. Because jax arrays are immutable, "cloning" the map for the frontend
(clone_obj, multiprocessing_utils.py:20-31) is just sharing the pytree.
"""

from __future__ import annotations

import queue
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussian_map as gm
from ..models.insertion import keyframe_to_gaussians
from ..render import RenderConfig
from ..render.camera import Intrinsics
from ..utils.logging import Log
from .frame import FrameData
from .mapping import (
    CamBatch,
    MapConfig,
    color_refinement_iters,
    covisibility_prune,
    empty_cam_batch,
    map_iters,
)


@dataclass
class Keyframe:
    uid: int
    data: FrameData
    T: jax.Array
    ea: jax.Array
    eb: jax.Array
    T_gt: Optional[jax.Array] = None


class BackEnd:
    def __init__(
        self,
        config: dict,
        gaussians: gm.GaussianMap,
        intr: Intrinsics,
        render_cfg: RenderConfig,
        mcfg: MapConfig,
        hyper: gm.MapHyper,
        frontend_queue,
        backend_queue,
        live_mode: bool = False,
        insert_cap: int = 32768,
        seed: int = 0,
    ):
        self.config = config
        self.gaussians = gaussians
        self.intr = intr
        self.render_cfg = render_cfg
        self.mcfg = mcfg
        self.hyper = hyper
        self.frontend_queue = frontend_queue
        self.backend_queue = backend_queue
        self.live_mode = live_mode
        self.insert_cap = insert_cap

        tr = config["Training"]
        self.monocular = tr["monocular"]
        self.single_thread = config["Dataset"].get("single_thread", False)
        self.init_itr_num = tr["init_itr_num"]
        self.mapping_itr_num = tr["mapping_itr_num"]
        self.window_size = tr["window_size"]
        self.pose_window = tr["pose_window"]
        self.prune_mode = tr.get("prune_mode", "slam")
        self.save_initial_ply = config["Results"].get("save_initial_ply", False)

        ds = config["Dataset"]
        self.pcd_downsample = ds.get("pcd_downsample", 64)
        self.pcd_downsample_init = ds.get("pcd_downsample_init", 32)
        self.point_size = ds.get("point_size", 0.01)
        self.adaptive_pointsize = ds.get("adaptive_pointsize", True)

        # multi-chip mapping (parallel/): `Parallel.n_devices` shards the
        # keyframe-view batch over a "view" axis (parallel/mesh.py);
        # `Parallel.gauss_devices` shards the MAP ITSELF over a "gauss"
        # axis (parallel/gauss_iters.py — no reference analogue, its
        # rasterizer assumes the whole model on one GPU). Both > 1 makes
        # a 2-D ("view", "gauss") mesh. 1/absent = single device.
        par = config.get("Parallel", {}) or {}
        self.n_devices = int(par.get("n_devices", 1))
        self.gauss_devices = int(par.get("gauss_devices", 1))
        self._mesh = None
        self._gauss_mesh = None
        if self.gauss_devices > 1:
            from ..parallel.gauss_iters import make_gauss_mesh2

            if render_cfg.backend != "pallas_lists":
                raise ValueError(
                    "Parallel.gauss_devices needs Renderer.backend="
                    "'pallas_lists' (the gauss-sharded mapping loop is "
                    "built on the fused Pallas loss/grad and counts "
                    "kernels; set Renderer.pallas_interpret for CPU runs)"
                )
            if self.n_devices > 1:
                self._gauss_mesh = make_gauss_mesh2(
                    self.n_devices, self.gauss_devices
                )
            else:
                from jax.sharding import Mesh

                self._gauss_mesh = Mesh(
                    np.asarray(jax.devices()[: self.gauss_devices]),
                    ("gauss",),
                )
            Log(
                f"Mapping sharded over mesh {dict(self._gauss_mesh.shape)}"
                " (map over 'gauss')"
            )
            # the gauss-sharded loop always runs the fused Pallas list
            # path; warn when the config asks for knobs it cannot honor
            ignored = [
                k for k, v, d in (
                    ("fused_grad", self.mcfg.fused_grad, True),
                    ("io_batch", self.mcfg.io_batch, False),
                    ("scatter_segsum", self.mcfg.scatter_segsum, False),
                    ("gather_first", self.mcfg.gather_first, False),
                ) if v != d
            ]
            if ignored:
                Log(
                    "Parallel.gauss_devices ignores non-default mapping "
                    f"knobs {ignored} (the gauss-sharded loop is fused-"
                    "Pallas only)", tag="warn",
                )
        elif self.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self._mesh = make_mesh(self.n_devices)
            Log(f"Mapping sharded over {self.n_devices} devices")

        # wall-clock stage accounting for the full-system FPS decomposition
        # (reference prints per-stage averages, slam_backend.py logging;
        # consumed by bench.py's slam bench and utils/profiling plots)
        from ..utils.profiling import StageTimers

        self.timers = StageTimers(period=1 << 30, tag="ProfBE")

        self.iteration_count = 0
        self.last_sent = 0
        self.viewpoints: dict[int, Keyframe] = {}
        self.current_window: list[int] = []
        self.occ_aware_visibility: dict[int, np.ndarray] = {}
        self.initialized = not self.monocular
        self.pause = False
        self._key = jax.random.PRNGKey(seed + 12345)
        self._np_rng = np.random.default_rng(seed + 54321)
        self._kf_adam = None  # window-pose Adam state, reset per keyframe
        # visibility of the last map() call, reused by the covisibility
        # prune when the map is unchanged since (see map(prune=True))
        self._last_vis = None
        self._last_vis_window: list | None = None

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _map_iters(self, m, cams, n_iters, it_count, key, **kw):
        """map_iters, routed through the device mesh when configured."""
        if self._gauss_mesh is not None:
            from ..parallel.gauss_iters import gp_sharded_map_iters

            return gp_sharded_map_iters(
                m, cams, n_iters, it_count, key, self._gauss_mesh,
                self.intr, self.render_cfg, self.mcfg, self.hyper, **kw,
            )
        if self._mesh is None:
            return map_iters(
                m, cams, n_iters, it_count, key,
                self.intr, self.render_cfg, self.mcfg, self.hyper, **kw,
            )
        from ..parallel.mesh import sharded_map_iters

        return sharded_map_iters(
            m, cams, n_iters, it_count, key, self._mesh,
            self.intr, self.render_cfg, self.mcfg, self.hyper, **kw,
        )

    def add_next_kf(self, frame_idx, kf: Keyframe, depth_map, init=False):
        """extend_from_pcd_seq (slam_backend.py:72-75)."""
        factor = self.pcd_downsample_init if init else self.pcd_downsample
        leaves, count = keyframe_to_gaussians(
            self._next_key(),
            kf.data.gt_image,
            jnp.asarray(depth_map, jnp.float32),
            kf.T,
            kf.ea,
            kf.eb,
            intr=self.intr,
            cap=self.insert_cap,
            sh_k=self.gaussians.params.sh.shape[1],
            downsample_factor=factor,
            point_size=self.point_size,
            adaptive_pointsize=self.adaptive_pointsize,
        )
        self.gaussians = gm.insert(self.gaussians, leaves, count, frame_idx)
        self._last_vis_window = None  # map changed: stored visibility stale
        n_active = int(self.gaussians.n_active)
        cap = self.gaussians.capacity
        if n_active > 0.9 * cap:
            Log(
                f"map at {n_active}/{cap} capacity — inserts will start "
                "dropping; raise Renderer.map_capacity",
                tag="Warn",
            )

    def reset(self):
        """Full map + window reset (slam_backend.py:77-89)."""
        self.iteration_count = 0
        self.occ_aware_visibility = {}
        self.viewpoints = {}
        self.current_window = []
        self.initialized = not self.monocular
        self._kf_adam = None
        self._last_vis = None
        self._last_vis_window = None
        self.gaussians = gm.prune(
            self.gaussians, jnp.ones((self.gaussians.capacity,), bool)
        )
        while not self.backend_queue.empty():
            try:
                self.backend_queue.get_nowait()
            except queue.Empty:
                break

    # ------------------------------------------------------------------
    def _stage_batch(self, window, pool_ids, frames_to_optimize) -> CamBatch:
        b = self.window_size + self.mcfg.pool_size
        h, w = self.intr.height, self.intr.width
        views = []
        for rank, kf_idx in enumerate(window):
            kf = self.viewpoints[kf_idx]
            views.append(
                (
                    kf,
                    True,
                    rank < frames_to_optimize and kf_idx != 0,
                    kf_idx != 0,
                )
            )
        for kf_idx in pool_ids:
            views.append((self.viewpoints[kf_idx], True, False, False))
        while len(views) < b:
            views.append((None, False, False, False))
        views = views[:b]

        def stack(get, fill):
            return jnp.stack(
                [get(v[0]) if v[0] is not None else fill for v in views]
            )

        z_img = jnp.zeros((3, h, w))
        z_map = jnp.zeros((1, h, w))
        return CamBatch(
            gt_image=stack(lambda k: k.data.gt_image, z_img),
            gt_depth=stack(lambda k: k.data.gt_depth, z_map),
            mapping_mask=stack(lambda k: k.data.mapping_mask, z_map),
            T=stack(lambda k: k.T, jnp.eye(4)),
            ea=stack(lambda k: k.ea, jnp.float32(1.0)),
            eb=stack(lambda k: k.eb, jnp.float32(0.0)),
            valid=jnp.array([v[1] for v in views]),
            opt_pose=jnp.array([v[2] for v in views]),
            opt_exposure=jnp.array([v[3] for v in views]),
        )

    def _writeback(self, window, cams: CamBatch, visibility):
        vis_np = np.asarray(visibility)
        for rank, kf_idx in enumerate(window):
            kf = self.viewpoints[kf_idx]
            kf.T = cams.T[rank]
            kf.ea = cams.ea[rank]
            kf.eb = cams.eb[rank]
            self.occ_aware_visibility[kf_idx] = vis_np[rank]

    def initialize_map(self, cur_frame_idx):
        """init_itr_num iterations on the first keyframe (:91-155)."""
        kf = self.viewpoints[cur_frame_idx]
        cams = CamBatch(
            gt_image=kf.data.gt_image[None],
            gt_depth=kf.data.gt_depth[None],
            mapping_mask=kf.data.mapping_mask[None],
            T=kf.T[None],
            ea=kf.ea[None],
            eb=kf.eb[None],
            valid=jnp.array([True]),
            opt_pose=jnp.array([False]),
            opt_exposure=jnp.array([False]),
        )
        self.gaussians, _, it, vis, _ = self._map_iters(
            self.gaussians, cams, self.init_itr_num,
            jnp.int32(self.iteration_count), self._next_key(),
            initialization=True,
        )
        self.iteration_count = int(it)
        self.occ_aware_visibility[cur_frame_idx] = np.asarray(vis[0])
        Log("Initialized map")

        if self.save_initial_ply:
            # save the post-init map and stop (slam_backend.py:148-153)
            import os

            from ..models.ply import save_ply

            Log("Saving initial ply")
            save_ply(
                self.gaussians,
                os.path.join(
                    self.config["Results"].get("save_dir", "results") or ".",
                    "frame1.ply",
                ),
            )
            self.backend_queue.put(["stop"])
            self.frontend_queue.put(["stop"])

    def map(self, window, prune=False, iters=1, frames_to_optimize=None):
        """BackEnd.map (:157-333). prune=True runs the covisibility prune
        (which in the reference skips all optimizer steps and returns)."""
        if len(window) == 0:
            return
        if frames_to_optimize is None:
            frames_to_optimize = self.pose_window

        if prune:
            if len(window) == self.window_size:
                # Reuse the visibility the immediately-preceding map() call
                # computed: map_iters' final n_touched pass runs AFTER the
                # last parameter/pose update, on exactly the map and poses
                # a fresh 0-iter render here would see — but that render
                # costs seconds (B views at mapping k_fine; 6.3 s/keyframe
                # in the 320x240 SLAM profile). Window rows are the first
                # window_size rows of the mapping batch. Reference
                # semantics: slam_backend.py:251-290 also prunes on the
                # visibility of the final mapping iteration.
                if self._last_vis_window == list(window):
                    vis = self._last_vis
                else:  # fallback: a prune not preceded by map() on window
                    cams = self._stage_batch(window, [], 0)
                    _, _, _, vis, _ = self._map_iters(
                        self.gaussians, cams, 0,
                        jnp.int32(self.iteration_count), self._next_key(),
                    )
                    vis_np = np.asarray(vis)
                    for rank, kf_idx in enumerate(window):
                        self.occ_aware_visibility[kf_idx] = vis_np[rank]
                self.gaussians, _ = covisibility_prune(
                    self.gaussians,
                    vis[: self.window_size],
                    jnp.asarray(
                        window + [-1] * (self.window_size - len(window)),
                        jnp.int32,
                    ),
                    jnp.asarray(self.initialized),
                    self.mcfg,
                    prune_mode=self.prune_mode,
                )
                self._last_vis_window = None  # map changed by the prune
                if not self.initialized:
                    self.initialized = True
                    Log("Initialized SLAM")
            return

        candidates = [i for i in self.viewpoints if i not in set(window)]
        pool = list(
            self._np_rng.permutation(candidates)[: self.mcfg.pool_size]
        )
        cams = self._stage_batch(window, pool, frames_to_optimize)
        # the window pose/exposure Adam moments persist across idle-mapping
        # calls between keyframes (torch keeps keyframe_optimizers alive,
        # slam_backend.py:397-401, 489); without this, iters=1 idle calls
        # degenerate into fixed-size sign steps on the poses
        self.gaussians, cams_out, it, vis, self._kf_adam = self._map_iters(
            self.gaussians, cams, iters, jnp.int32(self.iteration_count),
            self._next_key(), kf_adam=self._kf_adam,
        )
        self.iteration_count = int(it)
        self.last_sent += iters
        self._writeback(window, cams_out, vis)
        self._last_vis = vis
        self._last_vis_window = list(window)

    def color_refinement(self, iteration_total=None, chunk=2000, pool=16):
        """26k-iteration photometric refinement (:335-368), staged in chunks
        of random keyframes."""
        if iteration_total is None:
            # 26000 iterations as in the reference (slam_backend.py:338),
            # overridable for small scenes / CI via Training.refinement_itr
            iteration_total = self.config["Training"].get("refinement_itr", 26000)
        Log(f"Starting color refinement ({iteration_total} iters)")
        done = 0
        while done < iteration_total:
            ids = list(self._np_rng.permutation(list(self.viewpoints))[:pool])
            b = max(pool, 1)
            h, w = self.intr.height, self.intr.width
            cams = empty_cam_batch(b, h, w)
            views = [self.viewpoints[i] for i in ids]
            if not views:
                break
            cams = CamBatch(
                gt_image=jnp.stack(
                    [v.data.gt_image for v in views]
                    + [views[0].data.gt_image] * (b - len(views))
                ),
                gt_depth=cams.gt_depth,
                mapping_mask=cams.mapping_mask,
                T=jnp.stack(
                    [v.T for v in views] + [views[0].T] * (b - len(views))
                ),
                ea=cams.ea,
                eb=cams.eb,
                valid=jnp.array(
                    [True] * len(views) + [False] * (b - len(views))
                ),
                opt_pose=cams.opt_pose,
                opt_exposure=cams.opt_exposure,
            )
            n = min(chunk, iteration_total - done)
            self._last_vis_window = None  # refinement moves the map
            self.gaussians = color_refinement_iters(
                self.gaussians, cams, n, self._next_key(),
                self.intr, self.render_cfg, self.mcfg, self.hyper,
            )
            done += n
        Log("Map refinement done")

    def stage_summary(self) -> dict:
        """{stage: (total_seconds, count)} accumulated backend wall-clock —
        the full-system FPS decomposition (init BA / keyframe BA / idle
        mapping / inserts / prune passes)."""
        return {
            k: (self.timers.sums[k], self.timers.counts[k])
            for k in sorted(self.timers.sums)
        }

    def push_to_frontend(self, tag=None):
        self.last_sent = 0
        keyframes = [
            (kf_idx, self.viewpoints[kf_idx].T) for kf_idx in self.current_window
        ]
        if tag is None:
            tag = "sync_backend"
        self.frontend_queue.put(
            [tag, self.gaussians, dict(self.occ_aware_visibility), keyframes]
        )

    # ------------------------------------------------------------------
    def run(self):
        """Message loop (slam_backend.py:382-500)."""
        while True:
            if self.backend_queue.empty():
                if self.pause or len(self.current_window) == 0 or self.single_thread:
                    time.sleep(0.01)
                    continue
                with self.timers.stage("map_idle"):
                    self.map(self.current_window)
                if self.last_sent >= 10:
                    with self.timers.stage("map_prune"):
                        self.map(self.current_window, prune=True, iters=10)
                    self.push_to_frontend()
                continue

            data = self.backend_queue.get()
            if data[0] == "stop":
                break
            elif data[0] == "pause":
                self.pause = True
            elif data[0] == "unpause":
                self.pause = False
            elif data[0] == "color_refinement":
                self.color_refinement()
                self.push_to_frontend()
            elif data[0] == "init":
                cur_frame_idx, kf, depth_map = data[1], data[2], data[3]
                Log("Resetting the system")
                self.reset()
                self.viewpoints[cur_frame_idx] = kf
                with self.timers.stage("insert"):
                    self.add_next_kf(cur_frame_idx, kf, depth_map, init=True)
                with self.timers.stage("map_init"):
                    self.initialize_map(cur_frame_idx)
                self.push_to_frontend("init")
            elif data[0] == "keyframe":
                cur_frame_idx, kf, current_window, depth_map = (
                    data[1], data[2], data[3], data[4],
                )
                self.viewpoints[cur_frame_idx] = kf
                self.current_window = current_window
                with self.timers.stage("insert"):
                    self.add_next_kf(cur_frame_idx, kf, depth_map)
                # fresh keyframe optimizer state, like the torch
                # keyframe_optimizers recreation (slam_backend.py:489)
                self._kf_adam = None

                frames_to_optimize = self.pose_window
                iter_per_kf = self.mapping_itr_num if self.single_thread else 10
                if not self.initialized:
                    if len(self.current_window) == self.window_size:
                        frames_to_optimize = self.window_size - 1
                        iter_per_kf = 50 if self.live_mode else 300
                        Log("Performing initial BA for initialization")
                    else:
                        iter_per_kf = self.mapping_itr_num
                with self.timers.stage("map_kf"):
                    self.map(
                        self.current_window, iters=iter_per_kf,
                        frames_to_optimize=frames_to_optimize,
                    )
                with self.timers.stage("map_prune"):
                    self.map(self.current_window, prune=True)
                self.push_to_frontend("keyframe")
            else:
                raise Exception("Unprocessed data", data)

        while not self.backend_queue.empty():
            self.backend_queue.get()
        while not self.frontend_queue.empty():
            self.frontend_queue.get()
