"""SLAM orchestrator: wires map, dataset, frontend, backend, queues, eval.

Equivalent of the SLAM class in /root/reference/slam.py:26-202. The
reference's three OS processes (frontend / backend / GUI over
torch.multiprocessing CUDA-IPC queues) become host threads sharing immutable
jax pytrees through plain queue.Queue — same message protocol, no
serialization, no cloning (jax arrays are immutable so a "snapshot" is a
reference). `single_thread: True` configs retain their deterministic
semantics: the backend thread only maps on request and the frontend blocks
on the keyframe acknowledgement.
"""

from __future__ import annotations

import math
import queue
import threading
import time

from ..models import gaussian_map as gm
from ..render import RenderConfig
from ..render.camera import Intrinsics
from ..utils.logging import Log
from .backend import BackEnd
from .frontend import FrontEnd
from .mapping import MapConfig
from .tracking import TrackConfig


def intrinsics_from_config(config) -> Intrinsics:
    calib = config["Dataset"]["Calibration"]
    return Intrinsics(
        fx=float(calib["fx"]), fy=float(calib["fy"]),
        cx=float(calib["cx"]), cy=float(calib["cy"]),
        width=int(calib["width"]), height=int(calib["height"]),
    )


def render_config_from_config(config, intr: Intrinsics) -> RenderConfig:
    tr = config["Training"]
    rc = config.get("Renderer", {})
    sh_degree = 3 if tr.get("spherical_harmonics", False) else 0
    backend = rc.get("backend", "xla")
    interpret = rc.get("pallas_interpret", False)
    if backend.startswith("pallas") and not interpret:
        # Pallas kernels lower through Mosaic, which needs real TPU
        # hardware. On CPU (unit tests, dataset-free dry runs) fall back to
        # the numerically-identical XLA blend unless the config explicitly
        # asks for interpreter mode.
        import jax

        if jax.default_backend() == "cpu":
            Log(
                f"Renderer.backend={backend} needs a TPU; falling back to "
                "the XLA blend on CPU (set Renderer.pallas_interpret for "
                "interpreter mode)."
            )
            backend = "xla"
    return RenderConfig(
        tile=rc.get("tile", 16),
        macro_tiles=rc.get("macro_tiles", 8),
        k_macro=rc.get("k_macro", 4096),
        k_fine=rc.get("k_fine", 512),
        sh_degree=sh_degree,
        macro_chunk=rc.get("macro_chunk", 0),
        backend=backend,
        pallas_interpret=interpret,
    )


def track_render_config(config, render_cfg: RenderConfig) -> RenderConfig:
    """Tracking-side RenderConfig: `Renderer.track_k_fine` override, else
    the shared k_fine.

    Round 2 clamped tracking k_fine to 256 here because the fused tracking
    kernels (fo loss+grad, 6-tangent jvp8) kept [bt*k_fine, P] blend
    intermediates in scoped VMEM and OOMed past ~256. The round-3 K-chunked
    kernels (pallas_lists._chunk_kc: ordered-scan carries across K-chunks)
    bound VMEM by the chunk size instead, so any k_fine compiles
    (hardware-validated at 512, scripts/validate_tpu_kernels.py) and the
    clamp is gone; track_k_fine remains purely a speed/accuracy knob (the
    reference's analogue is first_order num_pixels / sketched backward
    subsampling, slam_frontend.py:88,397 — tracking rarely needs mapping's
    full per-tile contributor depth)."""
    rc = config.get("Renderer", {})
    k = rc.get("track_k_fine")
    if k is None:
        k = render_cfg.k_fine
    return render_cfg._replace(k_fine=int(k))


def track_config_from_config(config) -> TrackConfig:
    tr = config["Training"]
    rgn = tr["RGN"]
    lr = tr["lr"]
    # so_from_fo_aux / final_reuse freeze macro-cell MEMBERSHIP at the
    # frame's SEED pose for the entire fo+so(+final) pipeline (fine-tile
    # selection and blend order are re-derived with CURRENT-pose geometry
    # every refine — renderer.refine_fine_lists fresh-z): if the total
    # intra-frame correction exceeds bin_margin pixels, membership goes
    # stale. 16 px was adjudicated over 3 seeds on the TUM-like bench
    # regime (docs/tracking_r5_attribution.md); 8 px measurably leaks
    # ~2 mm there. Warn when a config opts in with a thin margin.
    if rgn.get("so_from_fo_aux", False) or rgn.get("final_reuse", False):
        if rgn.get("bin_margin", 0) < 12:
            Log(
                "Training.RGN.so_from_fo_aux/final_reuse freeze macro "
                f"membership at the seed pose with bin_margin only "
                f"{rgn.get('bin_margin', 0)} px — 16 px is the validated "
                "floor on TUM-like motion; validate pose error on your "
                "motion regime before shipping this config.",
                tag="Warning",
            )
    return TrackConfig(
        monocular=tr["monocular"],
        alpha=tr.get("alpha", 0.95),
        use_huber=rgn["use_huber"],
        huber_delta=rgn["huber_delta"],
        pnorm=float(rgn["pnorm"]),
        fo_max_iter=rgn["first_order"]["max_iter"],
        so_max_iter=rgn["second_order"]["max_iter"],
        lr_trans=lr["cam_trans_delta"],
        lr_rot=lr["cam_rot_delta"],
        lr_exposure_a=lr.get("exposure_a", 0.01),
        lr_exposure_b=lr.get("exposure_b", 0.01),
        stack_dim=rgn["second_order"]["stack_dim"],
        sketch_dim=rgn["second_order"]["sketch_dim"],
        initial_lambda=rgn["second_order"]["initial_lambda"],
        max_lambda=rgn["second_order"]["max_lambda"],
        min_lambda=rgn["second_order"]["min_lambda"],
        increase_factor=rgn["second_order"]["increase_factor"],
        decrease_factor=rgn["second_order"]["decrease_factor"],
        so_converged=rgn["second_order"]["converged_threshold"],
        use_first_order_best=rgn["second_order"].get("use_first_order_best", True),
        use_best_loss=rgn.get("use_best_loss", True),
        bin_margin=rgn.get("bin_margin", 0.0),
        rebin_before_so=rgn.get("rebin_before_so", True),
        rebin_so=bool(rgn.get("rebin_so", rgn.get("rebin_so_every", 1))),
        rebin_so_iters=rgn.get("rebin_so_iters", 3),
        fo_tile_frac=rgn["first_order"].get("tile_frac", 1.0),
        so_tile_frac=rgn["second_order"].get("tile_frac", 1.0),
        fo_fused=rgn["first_order"].get("fused_kernel", True),
        final_refine=rgn.get("final_refine", True),
        so_from_fo_aux=rgn.get("so_from_fo_aux", False),
        final_reuse=rgn.get("final_reuse", False),
        fo_plateau_patience=rgn["first_order"].get("plateau_patience", 0),
        fo_plateau_rtol=rgn["first_order"].get("plateau_rtol", 1e-3),
        fo_min_iter=rgn["first_order"].get("min_iter", 0),
        so_plateau_patience=rgn["second_order"].get("plateau_patience", 0),
        so_plateau_rtol=rgn["second_order"].get("plateau_rtol", 1e-4),
    )


def map_config_from_config(config, cameras_extent: float = 6.0) -> MapConfig:
    tr = config["Training"]
    opt = config["opt_params"]
    lr = tr["lr"]
    return MapConfig(
        monocular=tr["monocular"],
        alpha=tr.get("alpha", 0.95),
        window_size=tr["window_size"],
        pose_window=tr["pose_window"],
        pool_size=config.get("Renderer", {}).get("pool_size", 2),
        lr_trans=lr["cam_trans_delta"] * 0.5,
        lr_rot=lr["cam_rot_delta"] * 0.5,
        lr_exposure_a=lr.get("exposure_a", 0.01),
        lr_exposure_b=lr.get("exposure_b", 0.01),
        densify_grad_threshold=opt["densify_grad_threshold"],
        gaussian_th=tr["gaussian_th"],
        gaussian_extent=cameras_extent * tr["gaussian_extent"],
        gaussian_update_every=tr["gaussian_update_every"],
        gaussian_update_offset=tr["gaussian_update_offset"],
        gaussian_reset=tr["gaussian_reset"],
        size_threshold=tr["size_threshold"],
        init_gaussian_update=tr["init_gaussian_update"],
        init_gaussian_reset=tr["init_gaussian_reset"],
        init_gaussian_th=tr["init_gaussian_th"],
        init_gaussian_extent=cameras_extent * tr["init_gaussian_extent"],
        densify_from_iter=opt["densify_from_iter"],
        lambda_dssim=opt["lambda_dssim"],
        # mapping's frozen per-view tile lists (MapConfig docstring): margin
        # in pixels (0 disables the frozen-list reuse) and rebuild cadence
        bin_margin=config.get("Renderer", {}).get("mapping_bin_margin", 4.0),
        rebin_every=config.get("Renderer", {}).get("mapping_rebin_every", 25),
        # default False: scripts/ab_mapping.py measured the batched kernel
        # 4.90 vs sequential 6.68 BA iters/s on v5e (see MapConfig)
        batch_render=config.get("Renderer", {}).get("mapping_batch_render",
                                                    False),
        fused_grad=config.get("Renderer", {}).get("mapping_fused_grad",
                                                  True),
        # per-iteration tile subsampling of the fused BA gradient
        # (MapConfig.tile_frac; 1.0 = full tiles)
        tile_frac=config.get("Renderer", {}).get("mapping_tile_frac", 1.0),
        # gather-first per-view pipeline (MapConfig.gather_first)
        gather_first=config.get("Renderer", {}).get("mapping_gather_first",
                                                    False),
    )


def map_hyper_from_config(config, spatial_lr_scale: float = 6.0) -> gm.MapHyper:
    opt = config["opt_params"]
    return gm.MapHyper(
        position_lr_init=opt["position_lr_init"],
        position_lr_final=opt["position_lr_final"],
        position_lr_delay_mult=opt["position_lr_delay_mult"],
        position_lr_max_steps=opt["position_lr_max_steps"],
        feature_lr=opt["feature_lr"],
        opacity_lr=opt["opacity_lr"],
        scaling_lr=opt["scaling_lr"],
        rotation_lr=opt["rotation_lr"],
        percent_dense=opt["percent_dense"],
        spatial_lr_scale=spatial_lr_scale,
    )


class SLAM:
    def __init__(self, config, dataset=None, save_dir=None):
        self.config = config
        self.save_dir = save_dir
        self.monocular = config["Dataset"]["sensor_type"] == "monocular"
        config["Training"]["monocular"] = self.monocular
        self.live_mode = config["Dataset"]["type"] == "realsense"
        self.eval_rendering_on = config["Results"].get("eval_rendering", False)

        if dataset is None:
            from ..data.datasets import load_dataset

            dataset = load_dataset(config)
        self.dataset = dataset

        self.intr = intrinsics_from_config(config)
        self.render_cfg = render_config_from_config(config, self.intr)
        self.track_render_cfg = track_render_config(config, self.render_cfg)
        self.tcfg = track_config_from_config(config)
        self.mcfg = map_config_from_config(config)
        self.hyper = map_hyper_from_config(config)

        capacity = config.get("Renderer", {}).get("map_capacity", 1 << 17)
        sh_degree = self.render_cfg.sh_degree
        gaussians = gm.new_map(capacity, sh_degree=sh_degree)

        self.frontend_queue = queue.Queue()
        self.backend_queue = queue.Queue()

        self.use_gui = config["Results"].get("use_gui", False) or self.live_mode
        self.q_main2vis = queue.Queue() if self.use_gui else None
        self.q_vis2main = queue.Queue() if self.use_gui else None

        self.frontend = FrontEnd(
            config, dataset, self.intr, self.track_render_cfg, self.tcfg,
            self.frontend_queue, self.backend_queue, save_dir=save_dir,
            q_main2vis=self.q_main2vis, q_vis2main=self.q_vis2main,
        )
        self.backend = BackEnd(
            config, gaussians, self.intr, self.render_cfg, self.mcfg,
            self.hyper, self.frontend_queue, self.backend_queue,
            live_mode=self.live_mode,
            insert_cap=config.get("Renderer", {}).get("insert_cap", 32768),
        )
        self.frontend.gaussians = gaussians

        from ..utils.metrics import MetricsLogger

        self.metrics = MetricsLogger(
            save_dir=save_dir,
            use_wandb=config["Results"].get("use_wandb", False),
        )
        self.frontend.metrics = self.metrics

    def _backend_main(self):
        # Failure detection: an exception in the backend thread must reach
        # the frontend, which otherwise blocks forever on keyframe
        # acknowledgements that will never come (observed: a compile OOM in
        # map_iters hung the whole run). The frontend raises on this message.
        try:
            self.backend.run()
        except BaseException as e:  # noqa: BLE001 - forwarded, not swallowed
            Log(f"Backend thread FAILED: {type(e).__name__}: {e}", tag="Error")
            self.frontend_queue.put(["backend_failed", e])

    def run(self):
        backend_thread = threading.Thread(target=self._backend_main, daemon=True)
        gui_thread = None
        if self.use_gui:
            from ..gui import ParamsGUI
            from ..gui import slam_gui

            params_gui = ParamsGUI(
                q_main2vis=self.q_main2vis, q_vis2main=self.q_vis2main,
                gaussians=self.backend.gaussians, intr=self.intr,
                render_cfg=self.render_cfg,
                port=self.config.get("Renderer", {}).get("gui_port", 8765),
                save_dir=self.save_dir,
            )
            gui_thread = threading.Thread(
                target=slam_gui.run, args=(params_gui,), daemon=True
            )
            gui_thread.start()
        t0 = time.time()
        backend_thread.start()
        self.frontend.run()
        self.backend_queue.put(["pause"])
        elapsed = time.time() - t0

        n_frames = len(self.frontend.cameras)
        fps = n_frames / max(elapsed, 1e-9)
        Log("Total time", elapsed, tag="Eval")
        Log("Total FPS", fps, tag="Eval")
        self.fps = fps
        self.elapsed = elapsed

        results = {"fps": fps, "n_frames": n_frames}
        if self.eval_rendering_on:
            from ..eval.ate import eval_ate
            from ..eval.rendering import eval_rendering

            self.gaussians = self.frontend.gaussians
            kf_indices = self.frontend.kf_indices
            ate = eval_ate(
                self.frontend.cameras, kf_indices, self.save_dir, 0,
                final=True, monocular=self.monocular,
            )
            before = eval_rendering(
                self.frontend.cameras, self.gaussians, self.dataset,
                self.save_dir, self.intr, self.render_cfg, kf_indices,
                iteration="before_opt",
            )
            # color refinement round trip (slam.py:161-174)
            while not self.frontend_queue.empty():
                self.frontend_queue.get()
            self.backend_queue.put(["color_refinement"])
            while True:
                if self.frontend_queue.empty():
                    time.sleep(0.01)
                    continue
                data = self.frontend_queue.get()
                if data[0] == "backend_failed":
                    raise RuntimeError("backend thread failed") from data[1]
                if data[0] == "sync_backend" and self.frontend_queue.empty():
                    self.gaussians = data[1]
                    break
            after = eval_rendering(
                self.frontend.cameras, self.gaussians, self.dataset,
                self.save_dir, self.intr, self.render_cfg, kf_indices,
                iteration="after_opt",
            )
            results.update(
                {"ate": ate, "before": before, "after": after}
            )
            # Before/After metrics table (slam.py:150-193)
            cols = ["tag", "psnr", "ssim", "lpips", "RMSE ATE", "FPS"]
            self.metrics.log_table(
                "metrics_table", cols,
                [
                    ["Before", before["mean_psnr"], before["mean_ssim"],
                     before["mean_lpips"], ate, fps],
                    ["After", after["mean_psnr"], after["mean_ssim"],
                     after["mean_lpips"], ate, fps],
                ],
            )
            self.metrics.finish()
            if self.save_dir is not None:
                from ..models.ply import save_ply
                import os

                path = os.path.join(
                    self.save_dir, "point_cloud", "final", "point_cloud.ply"
                )
                save_ply(self.gaussians, path)

        self.backend_queue.put(["stop"])
        backend_thread.join(timeout=60)
        if backend_thread.is_alive():
            # A backend mid-compile can exceed 60 s by a lot on CPU (the
            # fused map_iters program compiles for many minutes on a
            # 1-core host). Returning with a LIVE daemon thread is worse
            # than waiting: the leftover thread keeps compiling/executing
            # XLA programs concurrently with whatever the caller does
            # next — observed as an XLA:CPU segfault when a later test's
            # compile raced it (round 5, full-suite crash at
            # test_multichip). Wait it out; only a truly wedged backend
            # (dead relay) should ever trip the final error.
            Log("Backend still busy after 60s (long compile?); waiting up "
                "to 30 min for it to drain", tag="Warn")
            backend_thread.join(timeout=1740)
            if backend_thread.is_alive():
                raise RuntimeError(
                    "backend thread failed to stop within 30 min of the "
                    "stop message — refusing to return with a live "
                    "backend racing the caller"
                )
        Log("Backend stopped and joined the main thread")
        if gui_thread is not None:
            from ..gui.gui_utils import GaussianPacket

            self.q_main2vis.put(GaussianPacket(finish=True))
            gui_thread.join(timeout=10)
            Log("GUI Stopped and joined the main thread")
        self.results = results
        return results
