"""Tracking frontend: per-frame loop, keyframe policy, window management.

Mirrors FrontEnd (/root/reference/utils/slam_frontend.py:55-2006): constant-
velocity pose seeding after warmup, the fused tracking call (tracking.py),
keyframe decision (is_keyframe + overlap checks), window management with
monocular map-reset recovery, depth initialization for new keyframes, message
handlers (sync_backend / keyframe / init / stop), and periodic ATE
evaluation. Runs on the host; all hot-path math is inside the single
track_frame device program.
"""

from __future__ import annotations

import os
import queue
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..render import RenderConfig
from ..render.camera import Intrinsics
from ..utils.logging import Log
from .backend import Keyframe
from .frame import Frame, make_frame_data
from .keyframing import (
    add_to_window,
    is_keyframe,
    keyframe_depth_init,
    overlap_ratio,
)
from .tracking import TrackConfig, track_frame


class FrontEnd:
    def __init__(
        self,
        config: dict,
        dataset,
        intr: Intrinsics,
        render_cfg: RenderConfig,
        tcfg: TrackConfig,
        frontend_queue,
        backend_queue,
        save_dir=None,
        q_main2vis=None,
        q_vis2main=None,
        seed: int = 0,
    ):
        self.config = config
        self.dataset = dataset
        self.intr = intr
        self.render_cfg = render_cfg
        self.tcfg = tcfg
        self.frontend_queue = frontend_queue
        self.backend_queue = backend_queue
        self.q_main2vis = q_main2vis
        self.q_vis2main = q_vis2main
        self.save_dir = save_dir

        tr = config["Training"]
        self.monocular = tr["monocular"]
        self.kf_interval = tr["kf_interval"]
        self.window_size = tr["window_size"]
        self.kf_translation = tr["kf_translation"]
        self.kf_min_translation = tr["kf_min_translation"]
        self.kf_overlap = tr["kf_overlap"]
        self.kf_cutoff = tr.get("kf_cutoff", 0.4)
        self.edge_threshold = tr["edge_threshold"]
        self.rgb_boundary_threshold = tr["rgb_boundary_threshold"]
        self.single_thread = config["Dataset"].get("single_thread", False)
        # Depth-1 tracking dispatch pipeline: enqueue frame i's fused
        # tracking program (seeded from frame i-1's still-in-flight device
        # result) BEFORE the host syncs frame i-1, then do i-1's host-side
        # work (keyframe decision, GUI, logs) while the device runs frame i.
        # Hides the per-frame host sync (~30-50 ms on the axon relay —
        # bench.py measured 264 -> 216 ms/frame). Semantics deviation is
        # bounded: the speculated frame may track against a map snapshot one
        # sync_backend message older than the serial order would use — noise
        # already inherent to the threaded mode. Auto-disabled while
        # uninitialized (map resets), in single_thread deterministic mode,
        # and under pose-override replay (the seed must see overridden
        # poses). Training.pipeline_tracking: false opts out.
        self.pipeline_tracking = tr.get("pipeline_tracking", True)
        # Threaded-mode accuracy gate (see the run loop): hold tracking
        # while a keyframe request is in flight. Off = reference semantics.
        self.block_on_keyframe = tr.get("block_on_keyframe", False)
        self._pending = None  # (idx, Frame, TrackResult, t_dispatch)
        self.n_pipelined = 0  # frames dispatched ahead of the host sync
        self.dataset_type = config["Dataset"].get("type", "tum")
        self.save_results = config["Results"].get("save_results", False)
        self.save_trj = config["Results"].get("save_trj", False)
        self.save_trj_kf_intv = config["Results"].get("save_trj_kf_intv", 10)
        self.constant_velocity_warmup = 200  # slam_frontend.py:181

        self.initialized = not self.monocular
        self.cameras: dict[int, Frame] = {}
        self.kf_indices: list[int] = []
        self.current_window: list[int] = []
        self.occ_aware_visibility: dict[int, np.ndarray] = {}
        self.gaussians = None
        self.reset = True
        self.requested_init = False
        self.requested_keyframe = 0
        self.use_every_n_frames = 1
        self.median_depth = 4.0
        self.pause = False
        self._key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)
        self._ate_log: list[tuple[int, float]] = []
        self._traj: list[np.ndarray] = []     # estimated camera centers
        self._traj_gt: list[np.ndarray] = []

        # profiling / per-frame logs (SURVEY.md section 5; reference
        # slam_frontend.py:131-146, 882-898)
        from ..utils.profiling import ProfileLogger, StageTimers

        rgn = tr.get("RGN", {})
        self.timers = StageTimers(period=10)

        # tracking override / replay modes (slam_frontend.py:106-110,
        # 756-813): "gt" replaces the tracked pose with ground truth;
        # "first" replays a previously logged run's per-frame poses
        # unconditionally; "best" replays only the logged frames whose
        # tracking loss beat this run's. Isolates tracking error from
        # mapping error in A/B experiments.
        override = rgn.get("override", {})
        self.override_mode = override.get("mode", "none")
        self.override_data = None
        if self.override_mode in ("first", "best"):
            from ..utils.profiling import load_profile_logs

            logdir = override.get("first_logdir", "outputs")
            self.override_data = load_profile_logs(logdir)
            if not self.override_data:
                raise FileNotFoundError(
                    f"override mode '{self.override_mode}' found no "
                    f"run-frame*.npz logs under {logdir}"
                )
            Log(
                f"Tracking override '{self.override_mode}': replaying "
                f"{len(self.override_data)} logged frames from {logdir}"
            )

        self.profile_logger = None
        if rgn.get("log_output", False):
            logdir = os.path.join(
                rgn.get("log_basedir", "outputs"),
                time.strftime("%Y%m%d_%H%M"),
            )
            self.profile_logger = ProfileLogger(
                logdir, save_period=rgn.get("save_period", 10)
            )

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _load_frame(self, idx: int) -> Frame:
        image, depth, pose = self.dataset[idx]
        data = make_frame_data(
            image, depth, self.edge_threshold, self.rgb_boundary_threshold,
            self.dataset_type,
        )
        return Frame(
            uid=idx, T=jnp.eye(4), T_gt=jnp.asarray(pose, jnp.float32),
            data=data, depth_np=depth,
        )

    def add_new_keyframe(self, cur_frame_idx, depth=None, opacity=None,
                         init=False):
        """Depth map for Gaussian insertion (slam_frontend.py:183-234)."""
        self.kf_indices.append(cur_frame_idx)
        frame = self.cameras[cur_frame_idx]
        gt_img = np.asarray(frame.data.gt_image)
        valid_rgb = gt_img.sum(axis=0) > self.rgb_boundary_threshold
        if self.monocular:
            if depth is None:
                initial = 2.0 * np.ones(gt_img.shape[1:], np.float32)
                initial += (
                    self._np_rng.standard_normal(initial.shape).astype(np.float32)
                    * 0.3
                )
            else:
                initial = keyframe_depth_init(
                    np.asarray(depth[0]), np.asarray(opacity[0]), valid_rgb,
                    self._np_rng,
                )
            return initial
        initial = np.array(frame.depth_np, np.float32)
        initial[~valid_rgb] = 0
        return initial

    def initialize(self, cur_frame_idx, frame: Frame):
        """First-frame / reset handling (slam_frontend.py:236-252)."""
        self.initialized = not self.monocular
        self.kf_indices = []
        self.occ_aware_visibility = {}
        self.current_window = []
        while not self.backend_queue.empty():
            try:
                self.backend_queue.get_nowait()
            except queue.Empty:
                break
        frame.T = frame.T_gt
        depth_map = self.add_new_keyframe(cur_frame_idx, init=True)
        self.request_init(cur_frame_idx, frame, depth_map)
        self.reset = False

    def tracking(self, cur_frame_idx, frame: Frame):
        """Pose seed + fused tracking, serially (slam_frontend.py:340-902).

        The reference computes a constant-velocity seed but then overrides
        it with the previous pose (:349-358); keep that behavior. The
        previous pose may be a still-in-flight device array (pipelined
        mode passes the unsynced TrackResult.T) — track_frame dispatches
        on it without forcing a host sync.
        """
        prev = self.cameras[cur_frame_idx - self.use_every_n_frames]
        res, t0 = self._dispatch_tracking(cur_frame_idx, frame, prev.T)
        return self._finish_tracking(cur_frame_idx, frame, res, t0)

    def _dispatch_tracking(self, cur_frame_idx, frame: Frame, seed_T):
        """Enqueue the fused tracking program; returns (async result, t0)."""
        frame.T = seed_T
        t0 = time.time()
        res = track_frame(
            self.gaussians.render_view(),
            frame.data,
            frame.T,
            frame.exposure_a,
            frame.exposure_b,
            self._next_key(),
            self.intr,
            self.render_cfg,
            self.tcfg,
        )
        return res, t0

    def _finish_tracking(self, cur_frame_idx, frame: Frame, res, t0):
        """Host sync + per-frame bookkeeping for a dispatched tracking call.

        In pipelined mode the elapsed time spans dispatch -> ready, which
        overlaps the previous frame's host work — it is the frame's true
        wall-clock contribution in steady state, not pure device time.
        """
        jax.block_until_ready(res.T)
        elapsed = time.time() - t0
        frame.T = res.T
        frame.exposure_a = res.ea
        frame.exposure_b = res.eb

        # override / replay (slam_frontend.py:756-813)
        overridden = False
        if self.override_mode == "gt":
            frame.T = frame.T_gt
            overridden = True
        elif self.override_mode in ("first", "best"):
            rec = self.override_data.get(cur_frame_idx)
            if rec is not None and "pose" in rec:
                replay = self.override_mode == "first" or (
                    float(rec.get("last_l1", np.inf)) < float(res.last_l1)
                )
                if replay:
                    frame.T = jnp.asarray(rec["pose"], jnp.float32)
                    if "exposure_a" in rec:
                        frame.exposure_a = jnp.float32(rec["exposure_a"])
                        frame.exposure_b = jnp.float32(rec["exposure_b"])
                    overridden = True
        if overridden:
            # re-render at the overridden pose (the reference re-renders
            # after replacing the pose, slam_frontend.py:795-813): the
            # keyframe depth map, visibility gating, and median depth must
            # describe the pose the system adopts, not the drifted tracked
            # one. Pose/exposure/loss fields stay the tracker's own output
            # so the profile log of a replay run remains replayable.
            from ..ops.losses import get_median_depth
            from ..render import render as _render

            out = _render(
                self.gaussians.render_view(), frame.T, self.intr,
                self.render_cfg,
            )
            res = res._replace(
                image=out.image, depth=out.depth, opacity=out.opacity,
                n_touched=out.n_touched,
                median_depth=get_median_depth(out.depth, out.opacity),
            )

        self.median_depth = float(res.median_depth)
        self.timers.add("tracking", elapsed)
        self.timers.frame_done()
        if self.profile_logger is not None:
            self.profile_logger.log_frame(
                cur_frame_idx,
                tracking_ms=elapsed * 1000.0,
                last_l1=float(res.last_l1),
                fo_iters=int(res.fo_iters),
                so_iters=int(res.so_iters),
                # own tracking output (pre-override), so a replay run's logs
                # stay replayable (reference logs inside tracking, :882-898)
                pose=np.asarray(res.T),
                exposure_a=float(res.ea),
                exposure_b=float(res.eb),
                fo_losses=np.asarray(res.fo_losses),
                so_losses=np.asarray(res.so_losses),
            )
        return res

    def _flush_pending(self, post: bool = True):
        """Sync + host-side processing for the in-flight pipelined frame."""
        if self._pending is None:
            return
        idx, frame, res, t0 = self._pending
        self._pending = None
        self._finish_tracking(idx, frame, res, t0)
        if post:
            self._post_tracking(idx, frame, res)

    def request_keyframe(self, cur_frame_idx, frame: Frame, current_window,
                         depthmap):
        kf = Keyframe(
            uid=cur_frame_idx, data=frame.data, T=frame.T,
            ea=frame.exposure_a, eb=frame.exposure_b, T_gt=frame.T_gt,
        )
        self.backend_queue.put(
            ["keyframe", cur_frame_idx, kf, current_window, depthmap]
        )
        self.requested_keyframe += 1

    def request_init(self, cur_frame_idx, frame: Frame, depth_map):
        kf = Keyframe(
            uid=cur_frame_idx, data=frame.data, T=frame.T,
            ea=frame.exposure_a, eb=frame.exposure_b, T_gt=frame.T_gt,
        )
        self.backend_queue.put(["init", cur_frame_idx, kf, depth_map])
        self.requested_init = True

    def sync_backend(self, data):
        self.gaussians = data[1]
        self.occ_aware_visibility = data[2]
        for kf_id, kf_T in data[3]:
            self.cameras[kf_id].T = kf_T

    def _send_gui_packet(self, cur_frame_idx, frame):
        """Per-frame GUI update; full map snapshot every 5th frame
        (slam_frontend.py:1891-1909)."""
        if self.q_main2vis is None:
            return
        from ..gui.gui_utils import CameraMsg, GaussianPacket

        keyframes = [
            CameraMsg(uid=i, T=self.cameras[i].T, T_gt=self.cameras[i].T_gt)
            for i in self.current_window
        ]
        kf_window = (
            {self.current_window[0]: self.current_window[1:]}
            if self.current_window
            else {}
        )
        import numpy as np

        def center(T):
            T = np.asarray(T)
            return -T[:3, :3].T @ T[:3, 3]

        self._traj.append(center(frame.T))
        self._traj_gt.append(center(frame.T_gt))
        pkt = GaussianPacket(
            gaussians=self.gaussians if cur_frame_idx % 5 == 0 else None,
            current_frame=CameraMsg(
                uid=cur_frame_idx, T=frame.T, T_gt=frame.T_gt
            ),
            keyframes=keyframes,
            kf_window=kf_window,
            gtcolor=np.asarray(frame.data.gt_image) if frame.data else None,
            gtdepth=frame.depth_np,
            trajectory=np.asarray(self._traj, np.float32),
            trajectory_gt=np.asarray(self._traj_gt, np.float32),
        )
        self.q_main2vis.put(pkt)

    def _check_gui_pause(self):
        """Packet_vis2main back-channel (slam_frontend.py:1828-1838)."""
        if self.q_vis2main is None:
            return False
        import queue as _q

        try:
            data = self.q_vis2main.get_nowait()
        except _q.Empty:
            return self.pause
        self.pause = data.flag_pause
        self.backend_queue.put(["pause" if self.pause else "unpause"])
        return self.pause

    def cleanup(self, cur_frame_idx):
        self.cameras[cur_frame_idx].clean()

    metrics = None  # MetricsLogger, wired by the runtime

    def eval_ate_now(self, cur_frame_idx, final=False):
        from ..eval.ate import eval_ate

        ate = eval_ate(
            self.cameras, self.kf_indices, self.save_dir, cur_frame_idx,
            final=final, monocular=self.monocular,
        )
        self._ate_log.append((cur_frame_idx, ate))
        if self.metrics is not None:
            # wandb-style {step_metric, ate} record (eval_utils.py:110)
            self.metrics.log({"frame_idx": cur_frame_idx, "ate": ate})
        return ate

    def _post_tracking(self, cur_frame_idx, frame: Frame, res) -> bool:
        """Keyframe decision + window management after a tracked frame
        (slam_frontend.py:1868-1960). Returns False when a monocular map
        reset was triggered and the frame index must NOT advance — the same
        frame re-initializes the map on the next loop pass
        (slam_frontend.py:1947-51)."""
        self._send_gui_packet(cur_frame_idx, frame)

        if self.requested_keyframe > 0:
            self.cleanup(cur_frame_idx)
            return True

        last_keyframe_idx = self.current_window[0]
        check_time = (
            cur_frame_idx - last_keyframe_idx
        ) >= self.kf_interval
        curr_visibility = np.asarray(res.n_touched) > 0
        create_kf = is_keyframe(
            np.asarray(frame.T),
            np.asarray(self.cameras[last_keyframe_idx].T),
            self.median_depth,
            curr_visibility,
            self.occ_aware_visibility[last_keyframe_idx],
            self.kf_translation,
            self.kf_min_translation,
            self.kf_overlap,
        )
        if len(self.current_window) < self.window_size:
            ratio = overlap_ratio(
                curr_visibility,
                self.occ_aware_visibility[last_keyframe_idx],
            )
            create_kf = check_time and ratio < self.kf_overlap
        if self.single_thread:
            create_kf = check_time and create_kf

        if create_kf:
            poses = {
                idx: np.asarray(self.cameras[idx].T)
                for idx in self.current_window + [cur_frame_idx]
            }
            self.current_window, removed = add_to_window(
                cur_frame_idx, curr_visibility,
                self.occ_aware_visibility, self.current_window,
                poses, self.window_size, self.kf_cutoff,
                self.initialized,
            )
            if self.monocular and not self.initialized and removed is not None:
                self.reset = True
                Log(
                    "Keyframes lacks sufficient overlap to initialize "
                    "the map, resetting."
                )
                return False
            depth_map = self.add_new_keyframe(
                cur_frame_idx, depth=res.depth, opacity=res.opacity,
                init=False,
            )
            self.request_keyframe(
                cur_frame_idx, frame, self.current_window, depth_map
            )
        else:
            self.cleanup(cur_frame_idx)

        if (
            self.save_results
            and self.save_trj
            and create_kf
            and len(self.kf_indices) % self.save_trj_kf_intv == 0
        ):
            Log("Evaluating ATE at frame: ", cur_frame_idx + 1)
            self.eval_ate_now(cur_frame_idx + 1)
        return True

    # ------------------------------------------------------------------
    def run(self):
        cur_frame_idx = 0
        while True:
            if self._check_gui_pause():
                time.sleep(0.05)
                continue
            if self.frontend_queue.empty():
                if cur_frame_idx >= len(self.dataset):
                    self._flush_pending()
                    if self.save_results and self.save_trj:
                        self.eval_ate_now(cur_frame_idx, final=True)
                    if self.profile_logger is not None:
                        self.profile_logger.close()
                    break

                if self.requested_init:
                    time.sleep(0.01)
                    continue
                if self.single_thread and self.requested_keyframe > 0:
                    time.sleep(0.01)
                    continue
                if self.block_on_keyframe and self.requested_keyframe > 0:
                    # stricter-than-reference threaded gate: hold tracking
                    # while keyframe BA is in flight so the pose never runs
                    # ahead of a lagging map (the reference frontend tracks
                    # on through pending keyframes, slam_frontend.py run
                    # loop — fine at TUM frame-to-frame motion, divergent
                    # on fast sequences; docs/mapping_r4_attribution.md).
                    # Non-keyframe tracking still overlaps idle mapping.
                    time.sleep(0.005)
                    continue
                if not self.initialized and self.requested_keyframe > 0:
                    time.sleep(0.001)
                    continue

                frame = self._load_frame(cur_frame_idx)
                self.cameras[cur_frame_idx] = frame

                if self.reset:
                    self._flush_pending()  # defensive: pending implies initialized
                    self.initialize(cur_frame_idx, frame)
                    self.current_window.append(cur_frame_idx)
                    cur_frame_idx += 1
                    continue

                self.initialized = self.initialized or (
                    len(self.current_window) == self.window_size
                )

                pipelined = (
                    self.pipeline_tracking
                    and self.initialized
                    and not self.single_thread
                    and self.override_mode == "none"
                )
                if pipelined:
                    # seed from the in-flight device result when one exists:
                    # no host sync between consecutive tracking dispatches
                    prev_T = (
                        self._pending[2].T
                        if self._pending is not None
                        else self.cameras[
                            cur_frame_idx - self.use_every_n_frames
                        ].T
                    )
                    res, t0 = self._dispatch_tracking(
                        cur_frame_idx, frame, prev_T
                    )
                    self.n_pipelined += 1
                    self._flush_pending()
                    self._pending = (cur_frame_idx, frame, res, t0)
                    cur_frame_idx += 1
                    continue

                self._flush_pending()  # mode transition: drain before serial
                res = self.tracking(cur_frame_idx, frame)
                if not self._post_tracking(cur_frame_idx, frame, res):
                    continue
                cur_frame_idx += 1
            else:
                data = self.frontend_queue.get()
                if data[0] == "sync_backend":
                    self.sync_backend(data)
                elif data[0] == "keyframe":
                    self.sync_backend(data)
                    self.requested_keyframe -= 1
                elif data[0] == "init":
                    self.sync_backend(data)
                    self.requested_init = False
                elif data[0] == "backend_failed":
                    # failure detection: re-raise the backend thread's
                    # exception here (main thread) instead of deadlocking on
                    # an acknowledgement that will never come
                    raise RuntimeError(
                        "backend thread failed"
                    ) from data[1]
                elif data[0] == "stop":
                    # record the in-flight pose but skip keyframe requests —
                    # the backend is shutting down
                    self._flush_pending(post=False)
                    Log("Frontend Stopped.")
                    break
