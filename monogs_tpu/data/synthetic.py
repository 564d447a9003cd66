"""Synthetic Gaussian scenes + rendered RGB-D sequences.

The build/bench environment has no TUM/Replica/EuRoC data on disk, so the
test pyramid and the benchmark drive SLAM on sequences rendered from a known
random Gaussian scene with the framework's own renderer (SURVEY.md section 4:
"render a known Gaussian scene, track it"). Ground-truth poses follow a
smooth orbit; depth comes from the renderer's expected-depth channel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..render import GaussianArrays, Intrinsics, RenderConfig, render


def make_synthetic_scene(
    key,
    n: int = 4096,
    spread: float = 2.5,
    depth_mean: float = 3.5,
    depth_spread: float = 0.5,
    scale_min: float = 0.02,
    scale_max: float = 0.08,
) -> GaussianArrays:
    """An opaque textured bumpy *surface* of Gaussians facing the camera.

    A surface (not a volumetric cloud) is essential: real RGB-D scenes
    saturate accumulated alpha to ~1, which makes the renderer's unnormalized
    expected depth coincide with surface depth. A semi-transparent cloud
    biases both the synthetic "sensor" depth and the rebuilt map geometry,
    displacing the tracking optimum away from the true pose.
    """
    ks = jax.random.split(key, 6)
    xy = spread * (jax.random.uniform(ks[0], (n, 2)) * 2.0 - 1.0)
    x, y = xy[:, 0], xy[:, 1]
    # smooth height field: a few random-phase sinusoids
    z = depth_mean + depth_spread * (
        0.5 * jnp.sin(1.7 * x + 0.3) * jnp.cos(1.3 * y + 1.1)
        + 0.3 * jnp.sin(3.1 * x + 2.0)
        + 0.2 * jnp.cos(2.3 * y + 0.7)
    )
    # foreground clusters at distinct depths: a near-planar scene makes
    # lateral translation and yaw photometrically ambiguous (no parallax);
    # real indoor scenes have strong depth structure, so must the synthetic
    n_clusters = 6
    ck = jax.random.split(ks[1], 3)
    centers = spread * 0.7 * (jax.random.uniform(ck[0], (n_clusters, 2)) * 2 - 1)
    cdepths = depth_mean * (0.35 + 0.4 * jax.random.uniform(ck[1], (n_clusters,)))
    assign = jax.random.randint(ck[2], (n,), 0, 4 * n_clusters)
    in_cluster = assign < n_clusters
    ci = jnp.clip(assign, 0, n_clusters - 1)
    lx = centers[ci, 0] + 0.22 * spread * jnp.sin(13.7 * x + 5 * y)
    ly = centers[ci, 1] + 0.22 * spread * jnp.cos(11.3 * y + 7 * x)
    x = jnp.where(in_cluster, lx, x)
    y = jnp.where(in_cluster, ly, y)
    z = jnp.where(in_cluster, cdepths[ci] + 0.1 * jnp.sin(21.0 * (x + y)), z)
    # procedural color texture (band-limited, so photometric gradients exist
    # everywhere) + per-splat noise
    base = jnp.stack(
        [
            0.5 + 0.35 * jnp.sin(3.0 * x + 1.0) * jnp.cos(2.0 * y),
            0.5 + 0.35 * jnp.sin(2.2 * y + 0.5) * jnp.cos(1.5 * x + 2.2),
            0.5 + 0.35 * jnp.sin(2.7 * (x + y) + 1.7),
        ],
        axis=-1,
    )
    noise = 0.15 * (jax.random.uniform(ks[2], (n, 3)) * 2.0 - 1.0)
    from ..ops.sh import rgb_to_sh

    sh = rgb_to_sh(jnp.clip(base + noise, 0.02, 0.98))[:, None, :]
    log_scale = jnp.log(
        scale_min + (scale_max - scale_min) * jax.random.uniform(ks[3], (n, 3))
    )
    quat = jax.random.normal(ks[4], (n, 4)) * 0.2 + jnp.array([3.0, 0, 0, 0])
    # near-opaque splats -> accumulated alpha saturates like a real surface
    opa = jnp.full((n, 1), 4.0)
    return GaussianArrays(
        xyz=jnp.stack([x, y, z], axis=-1),
        sh=sh,
        log_scale=log_scale,
        quat=quat,
        opa_logit=opa,
        active=jnp.ones((n,), bool),
    )


def orbit_pose(t: float, trans_amp=0.25, rot_amp=0.06, pan=None) -> jnp.ndarray:
    """Smooth wiggly camera path around the identity (world->camera).

    `pan` is an optional 6-vector of linear-drift amplitudes (reached at
    t=1): a panning sweep that actually changes the visible set of the scene
    (needed to exercise the keyframe policy, which is covisibility-driven).
    """
    tau = jnp.array(
        [
            trans_amp * math.sin(2 * math.pi * t),
            trans_amp * 0.6 * math.sin(4 * math.pi * t + 0.5),
            trans_amp * 0.4 * math.sin(2 * math.pi * t + 1.3),
            rot_amp * math.sin(2 * math.pi * t + 0.7),
            rot_amp * math.sin(4 * math.pi * t),
            rot_amp * 0.5 * math.sin(2 * math.pi * t + 2.0),
        ],
        dtype=jnp.float32,
    )
    if pan is not None:
        tau = tau + t * jnp.asarray(pan, jnp.float32)
    return se3.se3_exp(tau)


def tum_like_amps(n_frames: int, step_trans: float = 0.008,
                  step_rot: float = 0.006):
    """(trans_amp, rot_amp) so the orbit's MEAN per-frame motion matches a
    real handheld sequence.

    The stock synthetic orbit covers its full path in n_frames, so small
    n_frames means violent per-frame motion — the round-4 sweep measured
    ~4x TUM fr3/office per-frame motion at 32 frames, which made threaded
    (reference-faithful, frontend-never-blocks) mode collapse in ATE and
    forced the recorded SLAM number to single-thread
    (docs/mapping_r4_attribution.md). Defaults: TUM fr3/long_office runs
    ~0.25 m/s translational / ~10 deg/s angular at 30 Hz
    (the benchmark's published sequence statistics) -> 8 mm and ~0.006 rad
    per frame.

    Calibration is numeric: measure the unit-amplitude orbit's mean
    per-frame translation/rotation once and scale (the two couple only
    at second order for these magnitudes).
    """
    ts = [i / max(n_frames, 1) for i in range(n_frames)]
    Tt = [np.asarray(orbit_pose(t, trans_amp=1.0, rot_amp=0.0)) for t in ts]
    Tr = [np.asarray(orbit_pose(t, trans_amp=0.0, rot_amp=1.0)) for t in ts]
    dt = np.mean([
        np.linalg.norm(Tt[i + 1][:3, 3] - Tt[i][:3, 3])
        for i in range(n_frames - 1)
    ])
    dr = np.mean([
        np.arccos(np.clip(
            (np.trace(Tr[i + 1][:3, :3] @ Tr[i][:3, :3].T) - 1) / 2, -1, 1))
        for i in range(n_frames - 1)
    ])
    return float(step_trans / max(dt, 1e-9)), float(step_rot / max(dr, 1e-9))


class SyntheticDataset:
    """Dataset-protocol object over a rendered synthetic sequence.

    Matches the reference dataset interface (utils/dataset.py:258-280):
    dataset[idx] -> (image [3,H,W], depth np [H,W] or None, pose T_cw 4x4),
    plus intrinsics attributes.
    """

    def __init__(
        self,
        intr: Intrinsics,
        n_frames: int = 32,
        n_gauss: int = 4096,
        seed: int = 0,
        sensor_type: str = "depth",
        render_cfg: RenderConfig | None = None,
        trans_amp: float = 0.25,
        rot_amp: float = 0.06,
        pan=None,
        motion: str = "orbit",
    ):
        if motion == "tum_like":
            # per-frame motion matched to TUM fr3/office statistics
            # regardless of n_frames (see tum_like_amps)
            trans_amp, rot_amp = tum_like_amps(n_frames)
        elif motion != "orbit":
            raise ValueError(f"unknown synthetic motion mode: {motion}")
        self.intr = intr
        self.fx, self.fy = intr.fx, intr.fy
        self.cx, self.cy = intr.cx, intr.cy
        self.width, self.height = intr.width, intr.height
        self.fovx, self.fovy = intr.fovx, intr.fovy
        self.sensor_type = sensor_type
        self.has_depth = sensor_type != "monocular"
        self.num_imgs = n_frames
        cfg = render_cfg or RenderConfig()
        self.scene = make_synthetic_scene(jax.random.PRNGKey(seed), n=n_gauss)
        self.poses = [
            orbit_pose(i / max(n_frames, 1), trans_amp, rot_amp, pan=pan)
            for i in range(n_frames)
        ]
        r = jax.jit(
            lambda T: render(self.scene, T, intr, cfg._replace(with_n_touched=False))
        )
        self._frames = []
        for T in self.poses:
            out = r(T)
            img = jnp.clip(out.image, 0.0, 1.0)
            depth = np.asarray(out.depth[0]) if self.has_depth else None
            self._frames.append((np.asarray(img), depth))

    def __len__(self):
        return self.num_imgs

    def __getitem__(self, idx):
        img, depth = self._frames[idx]
        return jnp.asarray(img), depth, self.poses[idx]
