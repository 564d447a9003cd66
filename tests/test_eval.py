import numpy as np

from monogs_tpu.eval.ate import evaluate_ate, umeyama


def _traj(n=20, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    p = np.zeros(3)
    for _ in range(n):
        p = p + 0.1 * rng.standard_normal(3)
        T = np.eye(4)
        T[:3, 3] = p
        poses.append(T)
    return poses


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((30, 3))
    # random rotation
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    s_true, t_true = 1.7, np.array([0.3, -0.2, 1.1])
    dst = s_true * (Q @ src.T).T + t_true
    s, R, t = umeyama(src, dst, with_scale=True)
    assert np.isclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R, Q, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_identical():
    gt = _traj()
    rmse, stats = evaluate_ate(gt, gt)
    assert rmse < 1e-9


def test_ate_invariant_to_rigid_offset():
    gt = _traj()
    offset = np.eye(4)
    offset[:3, 3] = [1.0, 2.0, 3.0]
    est = [offset @ T for T in gt]
    rmse, _ = evaluate_ate(gt, est)
    assert rmse < 1e-9


def test_ate_scale_corrected_when_monocular():
    gt = _traj()
    est = [T.copy() for T in gt]
    for T in est:
        T[:3, 3] *= 2.0  # global scale error
    rmse_mono, _ = evaluate_ate(gt, est, monocular=True)
    rmse_rigid, _ = evaluate_ate(gt, est, monocular=False)
    assert rmse_mono < 1e-9
    assert rmse_rigid > 0.01


def test_ate_detects_error():
    rng = np.random.default_rng(2)
    gt = _traj()
    est = [T.copy() for T in gt]
    for T in est:
        T[:3, 3] += 0.05 * rng.standard_normal(3)
    rmse, _ = evaluate_ate(gt, est)
    assert 0.01 < rmse < 0.2


def test_psnr_ssim_sanity():
    import jax.numpy as jnp

    from monogs_tpu.ops.image import psnr, ssim

    img = jnp.ones((3, 32, 32)) * 0.5
    noisy = img + 0.1
    assert float(psnr(img, img)) > 80
    assert float(psnr(img, noisy)) < 25
    assert float(ssim(img, img)) > 0.99
