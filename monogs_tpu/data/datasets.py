"""Dataset parsers and loaders: TUM, Replica, EuRoC (stereo SGBM), Realsense.

Faithful port of /root/reference/utils/dataset.py: same directory layouts,
timestamp association, pose conventions (stored poses are world->camera
inverses of the trajectory files), undistortion/rectification via OpenCV,
StereoSGBM disparity->depth for EuRoC, and a live pyrealsense2 pipeline
(gated — the sensor stack may be absent). Images load via cv2 (the reference
used lycon; cv2.imread returns BGR like lycon's default loader did for its
TUM usage — we convert to RGB float [3, H, W]).
"""

from __future__ import annotations

import csv
import glob
import os

import cv2
import numpy as np

from ..render.camera import focal2fov


def quaternion_matrix(q_wxyz):
    """4x4 homogeneous rotation from (w, x, y, z), replacing
    trimesh.transformations.quaternion_matrix."""
    w, x, y, z = q_wxyz
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(4)
    s = 2.0 / n
    T = np.eye(4)
    T[:3, :3] = np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
            [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
            [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
        ]
    )
    return T


class ReplicaParser:
    """dataset.py:21-47."""

    def __init__(self, input_folder):
        self.input_folder = input_folder
        self.color_paths = sorted(glob.glob(f"{input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(glob.glob(f"{input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        self.poses = []
        with open(f"{input_folder}/traj.txt", "r") as f:
            lines = f.readlines()
        for i in range(self.n_img):
            pose = np.array(list(map(float, lines[i].split()))).reshape(4, 4)
            self.poses.append(np.linalg.inv(pose))


class TUMParser:
    """dataset.py:50-124: timestamp association of rgb/depth/groundtruth."""

    def __init__(self, input_folder, frame_rate=32):
        self.input_folder = input_folder
        self.load_poses(input_folder, frame_rate)
        self.n_img = len(self.color_paths)

    @staticmethod
    def parse_list(filepath, skiprows=0):
        return np.loadtxt(filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows)

    @staticmethod
    def associate_frames(tstamp_image, tstamp_depth, tstamp_pose, max_dt=0.08):
        associations = []
        for i, t in enumerate(tstamp_image):
            j = np.argmin(np.abs(tstamp_depth - t))
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt) and (
                np.abs(tstamp_pose[k] - t) < max_dt
            ):
                associations.append((i, j, k))
        return associations

    def load_poses(self, datapath, frame_rate=-1):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        else:
            pose_list = os.path.join(datapath, "pose.txt")
        image_data = self.parse_list(os.path.join(datapath, "rgb.txt"))
        depth_data = self.parse_list(os.path.join(datapath, "depth.txt"))
        pose_data = self.parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data[:, 0:].astype(np.float64)

        tstamp_image = image_data[:, 0].astype(np.float64)
        tstamp_depth = depth_data[:, 0].astype(np.float64)
        tstamp_pose = pose_data[:, 0].astype(np.float64)
        associations = self.associate_frames(tstamp_image, tstamp_depth, tstamp_pose)

        indices = [0]
        for i in range(1, len(associations)):
            t0 = tstamp_image[associations[indices[-1]][0]]
            t1 = tstamp_image[associations[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices += [i]

        self.color_paths, self.poses, self.depth_paths = [], [], []
        for ix in indices:
            (i, j, k) = associations[ix]
            self.color_paths += [os.path.join(datapath, str(image_data[i, 1]))]
            self.depth_paths += [os.path.join(datapath, str(depth_data[j, 1]))]
            quat = pose_vecs[k][4:]  # (x, y, z, w)
            trans = pose_vecs[k][1:4]
            T = quaternion_matrix(np.roll(quat, 1))
            T[:3, 3] = trans
            self.poses += [np.linalg.inv(T)]


class EuRoCParser:
    """dataset.py:127-191: stereo pairs + IMU-frame groundtruth."""

    T_i_c0 = np.array(
        [
            [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
            [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
            [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )

    def __init__(self, input_folder, start_idx=0):
        self.input_folder = input_folder
        self.color_paths = sorted(glob.glob(f"{input_folder}/mav0/cam0/data/*.png"))
        self.color_paths_r = sorted(glob.glob(f"{input_folder}/mav0/cam1/data/*.png"))
        assert len(self.color_paths) == len(self.color_paths_r)
        self.color_paths = self.color_paths[start_idx:]
        self.color_paths_r = self.color_paths_r[start_idx:]
        self.n_img = len(self.color_paths)
        self.load_poses(
            f"{input_folder}/mav0/state_groundtruth_estimate0/data.csv"
        )

    def load_poses(self, path):
        self.poses = []
        with open(path) as f:
            reader = csv.reader(f)
            next(reader)
            data = np.array([list(map(float, row)) for row in reader])
        pose_ts = data[:, 0]
        for i in range(self.n_img):
            color_ts = float(os.path.basename(self.color_paths[i]).split(".")[0])
            k = int(np.argmin(np.abs(pose_ts - color_ts)))
            trans = data[k, 1:4]
            # EuRoC stores q_RS as (w, x, y, z) already — NOTE: the reference
            # applies np.roll(quat, 1) here (dataset.py:180), the fixup for
            # TUM's (x,y,z,w) order, which scrambles every EuRoC ground-truth
            # rotation; we pass it through correctly.
            quat = data[k, 4:8]
            T_w_i = quaternion_matrix(quat)
            T_w_i[:3, 3] = trans
            T_w_c = T_w_i @ self.T_i_c0
            self.poses += [np.linalg.inv(T_w_c)]


class BaseDataset:
    def __init__(self, config):
        self.config = config
        self.num_imgs = 999999

    def __len__(self):
        return self.num_imgs


class MonocularDataset(BaseDataset):
    """dataset.py:210-280: pinhole + optional undistortion + depth scale."""

    def __init__(self, config):
        super().__init__(config)
        calibration = config["Dataset"]["Calibration"]
        self.fx = calibration["fx"]
        self.fy = calibration["fy"]
        self.cx = calibration["cx"]
        self.cy = calibration["cy"]
        self.width = calibration["width"]
        self.height = calibration["height"]
        self.fovx = focal2fov(self.fx, self.width)
        self.fovy = focal2fov(self.fy, self.height)
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        self.disorted = calibration["distorted"]
        self.dist_coeffs = np.array(
            [
                calibration["k1"], calibration["k2"], calibration["p1"],
                calibration["p2"], calibration["k3"],
            ]
        )
        if self.disorted:
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                self.K, self.dist_coeffs, np.eye(3), self.K,
                (self.width, self.height), cv2.CV_32FC1,
            )
        self.has_depth = "depth_scale" in calibration
        self.depth_scale = calibration.get("depth_scale")
        self._native = None  # prefetching C++ decoder, set up by subclasses

    def _setup_native(self):
        """Attach the native prefetching loader when built (native/)."""
        from .native_loader import make_loader

        self._native = make_loader(
            self.color_paths,
            self.depth_paths if self.has_depth else None,
        )

    def _load_raw(self, idx):
        """(rgb HWC uint8 in RGB order, raw uint16 depth or None)."""
        if self._native is not None:
            try:
                return self._native.get(idx)
            except IOError:
                pass  # fall back to cv2 below
        image = cv2.imread(self.color_paths[idx])  # BGR
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        depth = None
        if self.has_depth:
            depth = cv2.imread(self.depth_paths[idx], cv2.IMREAD_ANYDEPTH)
        return image, depth

    def __getitem__(self, idx):
        import jax.numpy as jnp

        pose = self.poses[idx]
        image, depth_raw = self._load_raw(idx)
        depth = None
        if self.disorted:
            image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)
        if self.has_depth and depth_raw is not None:
            depth = depth_raw / self.depth_scale
        image = (
            jnp.asarray(np.clip(image / 255.0, 0.0, 1.0), jnp.float32)
            .transpose(2, 0, 1)
        )
        return image, depth, jnp.asarray(pose.astype(np.float32))


class StereoDataset(BaseDataset):
    """dataset.py:283-395: rectified stereo + SGBM disparity->depth."""

    def __init__(self, config):
        super().__init__(config)
        calibration = config["Dataset"]["Calibration"]
        self.width = calibration["width"]
        self.height = calibration["height"]
        cam0raw = calibration["cam0"]["raw"]
        cam0opt = calibration["cam0"]["opt"]
        cam1raw = calibration["cam1"]["raw"]
        cam1opt = calibration["cam1"]["opt"]
        self.fx, self.fy = cam0opt["fx"], cam0opt["fy"]
        self.cx, self.cy = cam0opt["cx"], cam0opt["cy"]
        self.fovx = focal2fov(self.fx, self.width)
        self.fovy = focal2fov(self.fy, self.height)
        K_raw = np.array(
            [
                [cam0raw["fx"], 0.0, cam0raw["cx"]],
                [0.0, cam0raw["fy"], cam0raw["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        Rmat = np.array(calibration["cam0"]["R"]["data"]).reshape(3, 3)
        K_raw_r = np.array(
            [
                [cam1raw["fx"], 0.0, cam1raw["cx"]],
                [0.0, cam1raw["fy"], cam1raw["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        K_r = np.array(
            [
                [cam1opt["fx"], 0.0, cam1opt["cx"]],
                [0.0, cam1opt["fy"], cam1opt["cy"]],
                [0.0, 0.0, 1.0],
            ]
        )
        Rmat_r = np.array(calibration["cam1"]["R"]["data"]).reshape(3, 3)
        dist0 = np.array(
            [cam0raw["k1"], cam0raw["k2"], cam0raw["p1"], cam0raw["p2"], cam0raw["k3"]]
        )
        dist1 = np.array(
            [cam1raw["k1"], cam1raw["k2"], cam1raw["p1"], cam1raw["p2"], cam1raw["k3"]]
        )
        self.map1x, self.map1y = cv2.initUndistortRectifyMap(
            K_raw, dist0, Rmat, self.K, (self.width, self.height), cv2.CV_32FC1
        )
        self.map1x_r, self.map1y_r = cv2.initUndistortRectifyMap(
            K_raw_r, dist1, Rmat_r, K_r, (self.width, self.height), cv2.CV_32FC1
        )
        self.disorted = calibration["distorted"]
        self.has_depth = True
        # following ORB-SLAM2's EuRoC config: baseline * fx (dataset.py:382)
        self.bf = 47.90639384423901

    def __getitem__(self, idx):
        import jax.numpy as jnp

        image = cv2.imread(self.color_paths[idx], 0)
        image_r = cv2.imread(self.color_paths_r[idx], 0)
        pose = self.poses[idx]
        if self.disorted:
            image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)
            image_r = cv2.remap(
                image_r, self.map1x_r, self.map1y_r, cv2.INTER_LINEAR
            )
        stereo = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=64, blockSize=20
        )
        stereo.setUniquenessRatio(40)
        disparity = stereo.compute(image, image_r) / 16.0
        disparity[disparity == 0] = 1e10
        depth = self.bf / disparity
        depth[depth < 0] = 0
        image = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
        image = (
            jnp.asarray(np.clip(image / 255.0, 0.0, 1.0), jnp.float32)
            .transpose(2, 0, 1)
        )
        return image, depth, jnp.asarray(pose.astype(np.float32))


class TUMDataset(MonocularDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = TUMParser(config["Dataset"]["dataset_path"])
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.poses = parser.poses
        self._setup_native()


class ReplicaDataset(MonocularDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = ReplicaParser(config["Dataset"]["dataset_path"])
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.poses = parser.poses
        self._setup_native()


class EurocDataset(StereoDataset):
    def __init__(self, config):
        super().__init__(config)
        parser = EuRoCParser(config["Dataset"]["dataset_path"], start_idx=0)
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.color_paths_r = parser.color_paths_r
        self.poses = parser.poses


class RealsenseDataset(BaseDataset):
    """dataset.py:431-518: live aligned RGB(+depth) stream, fixed exposure.
    Requires pyrealsense2 + a connected device."""

    def __init__(self, config):
        super().__init__(config)
        try:
            import pyrealsense2 as rs
        except ImportError as e:
            raise RuntimeError(
                "RealsenseDataset requires pyrealsense2 (not installed in "
                "this environment)"
            ) from e
        self.rs = rs
        self.pipeline = rs.pipeline()
        self.h, self.w = 360, 640
        self.rs_config = rs.config()
        self.rs_config.enable_stream(
            rs.stream.color, self.w, self.h, rs.format.bgr8, 30
        )
        self.rs_config.enable_stream(rs.stream.depth)
        self.profile = self.pipeline.start(self.rs_config)
        self.align = rs.align(rs.stream.color)
        rgb_sensor = self.profile.get_device().query_sensors()[1]
        rgb_sensor.set_option(rs.option.enable_auto_exposure, False)
        rgb_sensor.set_option(rs.option.enable_auto_white_balance, False)
        rgb_sensor.set_option(rs.option.exposure, 100)
        rgb_profile = rs.video_stream_profile(
            self.profile.get_stream(rs.stream.color)
        )
        intr = rgb_profile.get_intrinsics()
        self.fx, self.fy = intr.fx, intr.fy
        self.cx, self.cy = intr.ppx, intr.ppy
        self.width, self.height = intr.width, intr.height
        self.fovx = focal2fov(self.fx, self.width)
        self.fovy = focal2fov(self.fy, self.height)
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        self.disorted = True
        self.dist_coeffs = np.asarray(intr.coeffs)
        self.map1x, self.map1y = cv2.initUndistortRectifyMap(
            self.K, self.dist_coeffs, np.eye(3), self.K,
            (self.w, self.h), cv2.CV_32FC1,
        )
        self.has_depth = config["Dataset"]["sensor_type"] == "depth"
        if self.has_depth:
            self.depth_scale = (
                self.profile.get_device().first_depth_sensor().get_depth_scale()
            )

    def __getitem__(self, idx):
        import jax.numpy as jnp

        pose = np.eye(4, dtype=np.float32)
        frameset = self.pipeline.wait_for_frames()
        aligned = self.align.process(frameset)
        rgb_frame = aligned.get_color_frame()
        image = np.asanyarray(rgb_frame.get_data())
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if self.disorted:
            image = cv2.remap(image, self.map1x, self.map1y, cv2.INTER_LINEAR)
        image = (
            jnp.asarray(np.clip(image / 255.0, 0.0, 1.0), jnp.float32)
            .transpose(2, 0, 1)
        )
        depth = None
        if self.has_depth:
            depth_frame = aligned.get_depth_frame()
            depth = np.array(depth_frame.get_data()) * self.depth_scale
            depth[depth < 0] = 0
            np.nan_to_num(depth, nan=1000)
        return image, depth, jnp.asarray(pose)


def load_dataset(config):
    """dataset.py:520-530."""
    t = config["Dataset"]["type"]
    if t == "tum":
        return TUMDataset(config)
    elif t == "replica":
        return ReplicaDataset(config)
    elif t == "euroc":
        return EurocDataset(config)
    elif t == "realsense":
        return RealsenseDataset(config)
    elif t == "synthetic":
        from .synthetic import SyntheticDataset
        from ..render.camera import Intrinsics

        calib = config["Dataset"]["Calibration"]
        intr = Intrinsics(
            fx=float(calib["fx"]), fy=float(calib["fy"]),
            cx=float(calib["cx"]), cy=float(calib["cy"]),
            width=int(calib["width"]), height=int(calib["height"]),
        )
        syn = config["Dataset"].get("synthetic", {})
        return SyntheticDataset(
            intr,
            n_frames=syn.get("n_frames", 64),
            n_gauss=syn.get("n_gauss", 8192),
            seed=syn.get("seed", 0),
            sensor_type=config["Dataset"]["sensor_type"],
            trans_amp=syn.get("trans_amp", 0.25),
            rot_amp=syn.get("rot_amp", 0.06),
            pan=syn.get("pan"),
            # "tum_like" overrides the amplitudes so per-frame motion
            # matches TUM fr3/office statistics (synthetic.tum_like_amps)
            motion=syn.get("motion", "orbit"),
        )
    else:
        raise ValueError("Unknown dataset type")
