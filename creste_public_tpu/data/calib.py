"""CODa calibration + pose loading (host-side NumPy).

Parity targets: creste/datasets/coda_helpers.py:21-140 — ROS-style
calibration YAMLs (camera_matrix / rectification_matrix / projection_matrix
and the os1->camera extrinsic/projection pair), quaternion pose rows
``ts x y z qw qx qy qz``, and intrinsic scaling for feature-resolution
projection matrices.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import yaml

from creste_public_tpu.data.coda_constants import CALIBRATION_DIR, POSES_DIR


def _mat(node: dict) -> np.ndarray:
    rows = int(node.get("rows", 3))
    cols = int(node.get("cols", 3))
    return np.asarray(node["data"], np.float64).reshape(rows, cols)


@dataclass
class Calibration:
    K: np.ndarray  # [3,3] camera matrix
    R: np.ndarray  # [3,3] rectification
    P: np.ndarray  # [3,4] rectified projection
    lidar2cam: np.ndarray  # [4,4]
    lidar2camrect: np.ndarray  # [3,4] or [4,4]
    img_hw: tuple[int, int] = field(default=(0, 0))

    def scaled(self, scale: float) -> "Calibration":
        """Intrinsics at a downsampled image resolution (coda_helpers.py:60).

        lidar2camrect is recomputed exactly as the reference's
        get_pts2pixel_transform (projection.py:37-60): M(P[:3,:3]) @ R @
        lidar2cam — the rectification matrix IS applied and P's fourth
        (baseline) column is NOT.
        """
        K = self.K.copy()
        P = self.P.copy()
        K[:2] *= scale
        P[:2] *= scale
        M = np.eye(4)
        M[:3, :3] = P[:3, :3]
        canon = np.eye(4)
        canon[:3, :3] = self.R
        l2c = np.eye(4)
        l2c[:3, :] = self.lidar2cam[:3, :]
        l2r = M @ canon @ l2c
        return Calibration(
            K=K, R=self.R, P=P,
            lidar2cam=self.lidar2cam,
            lidar2camrect=l2r,
            img_hw=(int(self.img_hw[0] * scale), int(self.img_hw[1] * scale)),
        )

    def pixel_to_point(self, ds: float = 1.0) -> np.ndarray:
        """[4,4] pixel(+depth) -> LiDAR-frame point transform: the inverse
        of the rectified projection, homogenised (the dataset's `p2p`,
        codapefree_dataloader.py:803-841)."""
        c = self.scaled(1.0 / ds) if ds != 1.0 else self
        l2r = np.asarray(c.lidar2camrect, np.float64)
        if l2r.shape == (3, 4):
            h = np.eye(4)
            h[:3] = l2r
            l2r = h
        return np.linalg.inv(l2r).astype(np.float32)


def load_calibration(root: str, seq: int | str, cam: str = "cam0") -> Calibration:
    cal_dir = os.path.join(root, CALIBRATION_DIR, str(seq))
    with open(os.path.join(cal_dir, f"calib_{cam}_intrinsics.yaml")) as f:
        intr = yaml.safe_load(f)
    with open(os.path.join(cal_dir, f"calib_os1_to_{cam}.yaml")) as f:
        extr = yaml.safe_load(f)
    l2c = _mat(extr["extrinsic_matrix"])
    if l2c.shape[0] == 3:
        l2c = np.vstack([l2c, [0, 0, 0, 1]])
    return Calibration(
        K=_mat(intr["camera_matrix"]),
        R=_mat(intr["rectification_matrix"]),
        P=_mat(intr["projection_matrix"]),
        lidar2cam=l2c,
        lidar2camrect=_mat(extr["projection_matrix"]),
        img_hw=(int(intr["image_height"]), int(intr["image_width"])),
    )


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """[..., 4] (qw, qx, qy, qz) -> [..., 3, 3] (no scipy dependency);
    delegates to the single implementation in utils.geometry."""
    from creste_public_tpu.utils.geometry import quat_to_rotmat as _impl

    return _impl(q)


def poses_to_matrices(rows: np.ndarray) -> np.ndarray:
    """[N, 8] ``ts x y z qw qx qy qz`` rows -> [N, 4, 4] SE(3)
    (coda_helpers.py:74)."""
    n = rows.shape[0]
    out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    out[:, :3, :3] = quat_to_rotmat(rows[:, 4:8])
    out[:, :3, 3] = rows[:, 1:4]
    return out


def load_poses(root: str, seq: int | str, subdir: str = "dense") -> np.ndarray:
    """[N, 4, 4] LiDAR poses for a sequence; row i is frame i."""
    path = os.path.join(root, POSES_DIR, subdir, f"{seq}.txt")
    rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 8)
    return poses_to_matrices(rows)
