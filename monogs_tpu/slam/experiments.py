"""Tracking diagnostics harness.

Equivalent of the reference's in-situ verification machinery,
FrontEnd.tracking_experiment (/root/reference/utils/slam_frontend.py:
904-1690), triggered there when cur_frame_idx == Training.experiment_step:

  - check_grad (:1031-1127): validate every sketched-Jacobian entry SJ[i,j]
    against direct differentiation of the bucketed residual sums. Here the
    fused tracker builds SJ via jax.linearize, so the check compares
    linearize-JVP rows against jax.jacfwd of the same function — the same
    contract, minus a hand-written CUDA backward to distrust.
  - check_sketch (:1132-1306): distortion statistics of the count sketch
    over repeated draws (singular-value confidence intervals).
  - lm_sweep / step_size_sweep (:1310-1675): loss landscapes over the LM
    damping and first-order step size.

Usable programmatically or via `python -m monogs_tpu.slam.experiments`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses
from ..ops.sketch import apply_sketch, damped_lstsq, make_sketch
from ..render import RenderConfig, render
from .frame import FrameData
from .tracking import TrackConfig, _sketched_Sf


def check_grad(gauss, frame: FrameData, T, intr, cfg: RenderConfig,
               tcfg: TrackConfig, key, atol=1e-4):
    """Compare linearize-based SJ with jacfwd of the bucketed residual.

    Returns (max_abs_diff, SJ). Raises AssertionError when outside atol,
    mirroring the reference's torch.allclose assert (:1122-1127).
    """
    m_pix = frame.gt_image.shape[1] * frame.gt_image.shape[2]
    sketch = make_sketch(key, m_pix, tcfg.stack_dim, tcfg.sketch_dim)
    p0 = jnp.concatenate([jnp.zeros(6), jnp.ones(1), jnp.zeros(1)])

    def sf(p):
        return _sketched_Sf(gauss, frame, T, p, sketch, intr,
                            cfg._replace(with_n_touched=False), tcfg)[0]

    _, jvp = jax.linearize(sf, p0)
    SJ_lin = jax.vmap(jvp)(jnp.eye(8)).T
    SJ_direct = jax.jacfwd(sf)(p0)
    diff = float(jnp.max(jnp.abs(SJ_lin - SJ_direct)))
    assert diff < atol, f"SJ mismatch: {diff} >= {atol}"
    return diff, SJ_lin


def check_sketch(m=30000, n=8, stack_dim=8, sketch_dim=64, trials=100,
                 seed=0):
    """Singular-value distortion statistics of the count sketch over many
    draws (reference :1132-1306). Returns dict of mean/std/CI for the
    max/min singular-value ratios sigma(SA)/sigma(A)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n)).astype(np.float32)
    sigmas = np.linalg.svd(A, compute_uv=False)
    ratios_max, ratios_min = [], []
    for t in range(trials):
        spec = make_sketch(jax.random.PRNGKey(seed + t), m, stack_dim,
                           sketch_dim)
        SA = np.stack(
            [np.asarray(apply_sketch(jnp.asarray(A[:, j]), spec))
             for j in range(n)], axis=1,
        )
        s2 = np.linalg.svd(SA, compute_uv=False)
        ratios_max.append(s2[0] / sigmas[0])
        ratios_min.append(s2[-1] / sigmas[-1])
    rmax = np.array(ratios_max)
    rmin = np.array(ratios_min)
    out = {
        "sigma_max_ratio_mean": float(rmax.mean()),
        "sigma_max_ratio_std": float(rmax.std()),
        "sigma_min_ratio_mean": float(rmin.mean()),
        "sigma_min_ratio_std": float(rmin.std()),
        "distortion_theory": float(np.sqrt(n / (stack_dim * sketch_dim))),
    }
    return out


def lm_sweep(gauss, frame: FrameData, T, intr, cfg, tcfg, key,
             lambdas=(1e-4, 1e-3, 1e-2, 1e-1, 1.0, 10.0)):
    """Loss after one sketched-GN step, per LM lambda (reference :1310-)."""
    from ..ops import se3

    m_pix = frame.gt_image.shape[1] * frame.gt_image.shape[2]
    sketch = make_sketch(key, m_pix, tcfg.stack_dim, tcfg.sketch_dim)
    p0 = jnp.concatenate([jnp.zeros(6), jnp.ones(1), jnp.zeros(1)])

    def sf(p):
        return _sketched_Sf(gauss, frame, T, p, sketch, intr,
                            cfg._replace(with_n_touched=False), tcfg)[0]

    Sf, jvp = jax.linearize(sf, p0)
    SJ = jax.vmap(jvp)(jnp.eye(8)).T

    def l1_at(Tx, ea, eb):
        out = render(gauss, Tx, intr, cfg._replace(with_n_touched=False))
        r = losses.tracking_residual_rgb(
            out.image, frame.gt_image, out.opacity, frame.mapping_mask, ea, eb
        )
        return float(jnp.sum(jnp.abs(r)))

    results = {}
    for lam in lambdas:
        x = damped_lstsq(SJ, Sf, lam)
        T2 = se3.se3_exp(x[:6]) @ T
        results[float(lam)] = {
            "loss": l1_at(T2, 1.0 + x[6], x[7]),
            "step_norm": float(jnp.linalg.norm(x)),
        }
    return results


def step_size_sweep(gauss, frame: FrameData, T, intr, cfg, tcfg, key,
                    step_sizes=(3e-4, 1e-3, 3e-3, 1e-2, 3e-2),
                    n_iters=20):
    """First-order step-size sweep (reference :1310-1675): run n_iters of
    plain gradient descent on the tracking objective at each step size and
    record the loss trajectory — the loss landscape that motivated the
    fork's second-order tracker. Returns {step_size: {"losses": [...],
    "final_pose_delta": float}}."""
    from ..ops import se3
    from .tracking import _fo_loss

    cfg_t = cfg._replace(with_n_touched=False)
    results = {}
    for lr in step_sizes:
        Tc = T
        ea = jnp.float32(1.0)
        eb = jnp.float32(0.0)
        traj = []
        for _ in range(n_iters):
            p = jnp.concatenate([jnp.zeros(6), ea[None], eb[None]])
            (loss, (l1, _)), g = jax.value_and_grad(
                lambda q: _fo_loss(gauss, frame, Tc, q, intr, cfg_t, tcfg),
                has_aux=True,
            )(p)
            traj.append(float(l1))
            d = -lr * g
            Tc = se3.se3_exp(d[:6]) @ Tc
            ea = ea + d[6]
            eb = eb + d[7]
        trans_d, ang_d = se3.pose_diff(Tc, T)
        results[float(lr)] = {
            "losses": traj,
            "final_trans_delta": float(trans_d),
            "final_angle_delta": float(ang_d),
        }
    return results


def main():
    import json

    print(json.dumps(check_sketch(trials=20), indent=2))


if __name__ == "__main__":
    main()
