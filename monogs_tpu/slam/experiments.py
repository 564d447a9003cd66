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
        T2 = se3.retract(T, x[:6])
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
            Tc = se3.retract(Tc, d[:6])
            ea = ea + d[6]
            eb = eb + d[7]
        trans_d, ang_d = se3.pose_diff(Tc, T)
        results[float(lr)] = {
            "losses": traj,
            "final_trans_delta": float(trans_d),
            "final_angle_delta": float(ang_d),
        }
    return results


def kfine_vs_backward_subsample(gauss, frame: FrameData, T, intr,
                                cfg: RenderConfig, tcfg: TrackConfig,
                                key, k_fine_full=None, k_fine_trunc=None):
    """Quantify the claim that the per-tile k_fine capacity subsumes the
    reference's `num_backward_gaussians` backward subsampling
    (slam_frontend.py:88,397; COMPONENTS.md FrontEnd row).

    Both mechanisms bound the backward pass's cost. The reference's
    rasterizer backward sums per-gaussian pose-gradient terms over a
    random subset of GAUSSIANS only (unbiased direction, high variance);
    k_fine truncation drops the most-occluded per-tile TAIL (biased
    toward zero-weight contributors, low variance). This compares the
    8-dim tracking gradient each mechanism produces against the
    untruncated gradient at MATCHED backward fraction:

      frac = k_fine_trunc / k_fine_full
      g_ref   = grad at k_fine_full (untruncated)
      g_trunc = grad at k_fine_trunc (our mechanism)
      g_sub   = grad at k_fine_full with only a random `frac` subset of
                gaussians contributing pose gradient (the reference's
                mechanism)

    g_sub emulation: a dropped gaussian must keep its forward
    contribution but contribute ZERO to dL/dtau. Conjugation does this
    exactly: pre-transform dropped gaussians in world space by
    M(tau) = (Exp(tau) T)^-1 Exp(sg(tau)) T, so their camera-frame path
    becomes Exp(sg(tau)) T x — pose-CONSTANT under differentiation —
    while the primal is unchanged (M = I at the evaluation point). The
    covariance orientation is conjugated too (quat premultiplied by the
    quaternion of M's rotation). Like the reference, kept terms are NOT
    rescaled by 1/frac (cosines are scale-invariant; norm_ratio_sub
    reports the raw shrinkage).

    Returns cosine similarities and norm ratios vs g_ref. Higher cosine
    at equal frac = better gradient fidelity per unit of backward work.
    Reference: gaussian_renderer/__init__.py:33,143 and
    slam_frontend.py:88,397.
    """
    from ..ops import se3
    from .tracking import _fo_loss

    cfg_full = cfg._replace(
        with_n_touched=False,
        k_fine=k_fine_full or max(cfg.k_fine * 4, 256),
    )
    cfg_trunc = cfg_full._replace(k_fine=k_fine_trunc or cfg.k_fine)
    frac = cfg_trunc.k_fine / cfg_full.k_fine
    p0 = jnp.concatenate([jnp.zeros(6), jnp.ones(1), jnp.zeros(1)])

    def g_at(c, gz):
        return jax.grad(
            lambda p: _fo_loss(gz, frame, T, p, intr, c, tcfg)[0]
        )(p0)

    g_ref = g_at(cfg_full, gauss)
    g_trunc = g_at(cfg_trunc, gauss)

    keep = jax.random.uniform(key, (gauss.xyz.shape[0],)) < frac

    def rotmat_to_quat_near_identity(R):
        # valid for trace(R) > -1 (M is a perturbation of the identity
        # at the linearization point, so the w>0 branch always holds)
        w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] + R[1, 1] + R[2, 2],
                                       1e-12))
        return jnp.stack([
            w,
            (R[2, 1] - R[1, 2]) / (4 * w),
            (R[0, 2] - R[2, 0]) / (4 * w),
            (R[1, 0] - R[0, 1]) / (4 * w),
        ])

    def quat_premul(p, q):
        # (w,x,y,z) Hamilton product p ⊗ q, p broadcast over rows of q
        pw, px, py, pz = p
        qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return jnp.stack([
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ], axis=1)

    def masked_loss(p):
        C = se3.retract(T, p[:6])
        C0 = se3.retract(T, jax.lax.stop_gradient(p[:6]))
        M = jnp.linalg.solve(C, C0)
        xyz_m = gauss.xyz @ M[:3, :3].T + M[:3, 3]
        quat_m = quat_premul(rotmat_to_quat_near_identity(M[:3, :3]),
                             gauss.quat)
        gz = gauss._replace(
            xyz=jnp.where(keep[:, None], gauss.xyz, xyz_m),
            quat=jnp.where(keep[:, None], gauss.quat, quat_m),
        )
        return _fo_loss(gz, frame, T, p, intr, cfg_full, tcfg)[0]

    g_sub = jax.grad(masked_loss)(p0)

    def cos(a, b):
        return float(
            jnp.dot(a, b)
            / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-20)
        )

    return {
        "frac": float(frac),
        "cos_trunc_pose": cos(g_trunc[:6], g_ref[:6]),
        "cos_sub_pose": cos(g_sub[:6], g_ref[:6]),
        "cos_trunc_all": cos(g_trunc, g_ref),
        "cos_sub_all": cos(g_sub, g_ref),
        "norm_ratio_trunc": float(
            jnp.linalg.norm(g_trunc) / jnp.linalg.norm(g_ref)
        ),
        "norm_ratio_sub": float(
            jnp.linalg.norm(g_sub) / jnp.linalg.norm(g_ref)
        ),
    }


def pool_vs_fresh_sampling(scene, views, intr, cfg: RenderConfig,
                           mcfg, hyper, key, n_iters=60, window=3,
                           pool=2, chunk=10, perturb=0.3):
    """Quantify the mapping random-keyframe staging approximation
    (slam/mapping.py:14-19): the reference draws 2 fresh random past
    keyframes EVERY iteration from host RAM (slam_backend.py:176-182);
    the TPU design stages a fixed pool per map_iters CALL (re-drawn per
    call, ~10-60 iterations apart).

    Runs the same recovery problem (map degraded by `perturb` noise on
    xyz/opacity, optimized against `views`) both ways at equal total
    iterations:
      staged: map_iters in chunks of `chunk` iters, pool re-drawn per
              chunk (the production idle-mapping cadence)
      fresh:  map_iters with 1-iteration calls, pool re-drawn every call
              (the reference's per-iteration sampling)
    Returns mean per-view L1 after optimization for both, plus the
    degraded starting L1."""
    from .mapping import map_iters

    n_views = views.T.shape[0]

    def stage(k):
        # window = first `window` views (fixed), pool = random others
        ids = jax.random.choice(
            k, jnp.arange(window, n_views), shape=(pool,), replace=False
        )
        sel = jnp.concatenate([jnp.arange(window), ids])
        return jax.tree.map(lambda x: x[sel], views)

    def degrade(m, k):
        k1, k2 = jax.random.split(k)
        return m._replace(params=m.params._replace(
            xyz=m.params.xyz
            + perturb * 0.02 * jax.random.normal(k1, m.params.xyz.shape),
            opa_logit=m.params.opa_logit
            + perturb * jax.random.normal(k2, m.params.opa_logit.shape),
        ))

    def mean_l1(m):
        from .mapping import _gauss_view

        g = _gauss_view(m.params, m.active)
        tot = 0.0
        for i in range(n_views):
            out = render(g, views.T[i], intr,
                         cfg._replace(with_n_touched=False))
            tot += float(jnp.mean(jnp.abs(out.image - views.gt_image[i])))
        return tot / n_views

    k_deg, k_run = jax.random.split(key)
    results = {}
    for mode, step in (("staged", chunk), ("fresh", 1)):
        m = degrade(scene, k_deg)
        if "start_l1" not in results:
            results["start_l1"] = mean_l1(m)
        kf_adam = None
        it = jnp.int32(0)
        k = k_run
        done = 0
        while done < n_iters:
            k, k1, k2 = jax.random.split(k, 3)
            cams = stage(k1)
            n = min(step, n_iters - done)
            m, _, it, _, kf_adam = map_iters(
                m, cams, n, it, k2, intr, cfg, mcfg, hyper,
                kf_adam=kf_adam,
            )
            done += n
        results[mode + "_l1"] = mean_l1(m)
    results["ratio_fresh_over_staged"] = (
        results["fresh_l1"] / max(results["staged_l1"], 1e-12)
    )
    return results


def main():
    import json

    print(json.dumps(check_sketch(trials=20), indent=2))


if __name__ == "__main__":
    main()
