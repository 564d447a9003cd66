"""Dataset parser + loader tests over generated fixtures (TUM layout,
Replica layout, native C++ loader vs cv2 decode parity)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def make_tum_fixture(root, n=4, w=64, h=48):
    os.makedirs(root / "rgb", exist_ok=True)
    os.makedirs(root / "depth", exist_ok=True)
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines, gt_lines = [], [], ["# ts tx ty tz qx qy qz qw"]
    for i in range(n):
        t = 100.0 + i * 0.1
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{t:.6f}.png"), img)
        depth = (rng.uniform(0.5, 3.0, (h, w)) * 5000).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} {0.01*i} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(depth_lines))
    (root / "groundtruth.txt").write_text("\n".join(gt_lines))


def tum_config(path, w=64, h=48):
    return {
        "Dataset": {
            "type": "tum",
            "sensor_type": "depth",
            "dataset_path": str(path),
            "Calibration": {
                "fx": 60.0, "fy": 60.0, "cx": w / 2 - 0.5, "cy": h / 2 - 0.5,
                "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
                "width": w, "height": h, "depth_scale": 5000.0,
                "distorted": False,
            },
        }
    }


def test_tum_parser_and_loader(tmp_path):
    from monogs_tpu.data.datasets import TUMDataset

    make_tum_fixture(tmp_path)
    ds = TUMDataset(tum_config(tmp_path))
    assert len(ds) == 4
    img, depth, pose = ds[0]
    assert img.shape == (3, 48, 64)
    assert float(img.max()) <= 1.0
    assert depth.shape == (48, 64)
    assert 0.4 < depth.mean() < 3.1  # metric depth after scale
    # gt poses are world->camera inverses of the trajectory
    np.testing.assert_allclose(np.asarray(pose)[:3, 3], [0, 0, 0], atol=1e-6)
    _, _, pose1 = ds[1]
    np.testing.assert_allclose(
        np.asarray(pose1)[:3, 3], [-0.01, 0, 0], atol=1e-6
    )


def test_replica_parser(tmp_path):
    from monogs_tpu.data.datasets import ReplicaDataset

    os.makedirs(tmp_path / "results", exist_ok=True)
    rng = np.random.default_rng(1)
    lines = []
    for i in range(3):
        img = rng.integers(0, 255, (24, 32, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "results" / f"frame{i:06d}.jpg"), img)
        depth = (rng.uniform(0.5, 2.0, (24, 32)) * 6553.5).astype(np.uint16)
        cv2.imwrite(str(tmp_path / "results" / f"depth{i:06d}.png"), depth)
        T = np.eye(4)
        T[0, 3] = 0.05 * i
        lines.append(" ".join(str(x) for x in T.reshape(-1)))
    (tmp_path / "traj.txt").write_text("\n".join(lines))

    cfg = tum_config(tmp_path, w=32, h=24)
    cfg["Dataset"]["type"] = "replica"
    cfg["Dataset"]["Calibration"]["depth_scale"] = 6553.5
    ds = ReplicaDataset(cfg)
    assert len(ds) == 3
    img, depth, pose = ds[1]
    assert img.shape == (3, 24, 32)
    np.testing.assert_allclose(np.asarray(pose)[0, 3], -0.05, atol=1e-6)


def test_native_loader_matches_cv2(tmp_path):
    from monogs_tpu.data.native_loader import make_loader

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    png_path = str(tmp_path / "a.png")
    cv2.imwrite(png_path, img[..., ::-1])  # cv2 writes BGR
    depth = rng.integers(0, 60000, (48, 64)).astype(np.uint16)
    dep_path = str(tmp_path / "d.png")
    cv2.imwrite(dep_path, depth)
    jpg_path = str(tmp_path / "b.jpg")
    cv2.imwrite(jpg_path, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])

    loader = make_loader([png_path, jpg_path], [dep_path, dep_path])
    if loader is None:
        pytest.skip("native loader not built")
    rgb0, d0 = loader.get(0)
    np.testing.assert_array_equal(rgb0, img)        # png lossless
    np.testing.assert_array_equal(d0, depth)        # 16-bit depth exact
    rgb1, _ = loader.get(1)
    ref = cv2.cvtColor(cv2.imread(jpg_path), cv2.COLOR_BGR2RGB)
    # jpeg decoders may differ by a few LSBs
    assert np.abs(rgb1.astype(int) - ref.astype(int)).mean() < 3.0


def test_euroc_parser_and_stereo_depth(tmp_path):
    """EuRoC layout + StereoSGBM disparity->depth path (dataset.py:283-395)."""
    from monogs_tpu.data.datasets import EurocDataset

    rng = np.random.default_rng(3)
    for cam in ("cam0", "cam1"):
        os.makedirs(tmp_path / "mav0" / cam / "data", exist_ok=True)
    os.makedirs(tmp_path / "mav0" / "state_groundtruth_estimate0", exist_ok=True)
    # textured image so SGBM finds some matches
    base = (rng.uniform(0, 255, (48, 96)) ).astype(np.uint8)
    rows = ["#ts,px,py,pz,qw,qx,qy,qz,..."]
    for i in range(3):
        ts = 1000000 + i * 50000
        left = np.roll(base, i, axis=1)
        right = np.roll(base, i + 4, axis=1)  # fixed disparity 4
        cv2.imwrite(str(tmp_path / "mav0/cam0/data" / f"{ts}.png"), left)
        cv2.imwrite(str(tmp_path / "mav0/cam1/data" / f"{ts}.png"), right)
        rows.append(f"{ts},{0.1*i},0,0,1,0,0,0," + ",".join(["0"] * 9))
    (tmp_path / "mav0/state_groundtruth_estimate0/data.csv").write_text(
        "\n".join(rows)
    )

    cfg = {
        "Dataset": {
            "type": "euroc",
            "sensor_type": "stereo",
            "dataset_path": str(tmp_path),
            "Calibration": {
                "width": 96, "height": 48, "distorted": False,
                "cam0": {
                    "raw": {"fx": 60, "fy": 60, "cx": 48, "cy": 24,
                            "k1": 0, "k2": 0, "p1": 0, "p2": 0, "k3": 0},
                    "opt": {"fx": 60, "fy": 60, "cx": 48, "cy": 24,
                            "k1": 0, "k2": 0, "p1": 0, "p2": 0, "k3": 0},
                    "R": {"rows": 3, "cols": 3,
                          "data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
                },
                "cam1": {
                    "raw": {"fx": 60, "fy": 60, "cx": 48, "cy": 24,
                            "k1": 0, "k2": 0, "p1": 0, "p2": 0, "k3": 0},
                    "opt": {"fx": 60, "fy": 60, "cx": 48, "cy": 24,
                            "k1": 0, "k2": 0, "p1": 0, "p2": 0, "k3": 0},
                    "R": {"rows": 3, "cols": 3,
                          "data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
                },
            },
        }
    }
    ds = EurocDataset(cfg)
    assert len(ds) == 3
    img, depth, pose = ds[1]
    assert img.shape == (3, 48, 96)
    assert depth.shape == (48, 96)
    assert (depth >= 0).all()
    # gt pose applies the IMU->cam0 extrinsic then inverts
    assert np.isfinite(np.asarray(pose)).all()
