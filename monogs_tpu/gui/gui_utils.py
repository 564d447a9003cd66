"""GUI message protocol: GaussianPacket / Packet_vis2main.

Field-compatible with the reference's gui/gui_utils.py:78-160 so the
frontend/backend code exchanges the same information: map snapshots (jax
arrays are immutable, so a "snapshot" is a reference — no clone_obj needed),
the current tracked frame, keyframe poses, the window graph, ground-truth
images, and the pause back-channel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class CameraMsg:
    """Slim pose-only camera message (camera_utils.py:164-168)."""

    uid: int
    T: Any
    T_gt: Any = None


@dataclass
class GaussianPacket:
    gaussians: Any = None            # GaussianMap snapshot (or None)
    current_frame: Optional[CameraMsg] = None
    keyframes: list = field(default_factory=list)
    kf_window: dict = field(default_factory=dict)
    gtcolor: Any = None              # [3, H, W]
    gtdepth: Any = None              # [H, W]
    # full estimated / ground-truth camera-center trajectories [n, 3]
    # (feeds the 3D map view's polyline; the reference draws these in its
    # Open3D scene, gui/slam_gui.py:256-344)
    trajectory: Any = None
    trajectory_gt: Any = None
    finish: bool = False


@dataclass
class Packet_vis2main:
    flag_pause: bool = False


@dataclass
class ParamsGUI:
    q_main2vis: Any = None
    q_vis2main: Any = None
    gaussians: Any = None
    intr: Any = None
    render_cfg: Any = None
    port: int = 8765
    save_dir: Any = None  # screenshots land here (cwd if None)
