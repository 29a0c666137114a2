"""Dense depth label generation (LiDAR accumulation -> z-buffer -> IDW).

Parity target: scripts/preprocessing/build_dense_depth.py —
  * per frame, accumulate ``scans`` neighbouring point clouds through the
    pose chain into the reference LiDAR frame (:224-366),
  * project through `lidar2camrect` with per-pixel max-depth priority
    (projection.py:64-146),
  * 'LA' mode stops there; 'LAIDW' additionally re-fills the bottom third
    from a 50-scan accumulation and runs IDW infill (:415-447),
  * save uint16 millimetre PNGs under
    ``depth_{scans}_{proc}_{type}/{cam}/{seq}/{frame}.png`` (:451-467).

TPU-first: accumulation + z-buffer is ONE jitted kernel per frame
(ops.depth_projection.accumulate_and_project), IDW is a fused jnp window
accumulation (ops.infill) — the reference's 24-process CPU pool becomes a
single device stream; the host only decodes .bin files and writes PNGs.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from creste_public_tpu.data import coda_constants as cc
from creste_public_tpu.data.calib import Calibration, load_calibration, load_poses
from creste_public_tpu.ops.depth_projection import accumulate_and_project
from creste_public_tpu.ops.infill import idw_densify


def load_scan(root: str, seq: str, frame: int) -> np.ndarray:
    """Ouster .bin -> [N, 3] xyz (coda_utils OUSTER_CLOUD_DIM)."""
    path = cc.frame_path(root, cc.POINTCLOUD_DIR, cc.DEFAULT_LIDAR, seq, frame, "bin")
    raw = np.fromfile(path, np.float32)
    feats = cc.OUSTER_FEATURES if raw.size % cc.OUSTER_FEATURES == 0 else 5
    return raw.reshape(-1, feats)[:, :3]


def depth_label_dirname(scans: int, proc: str, kind: str = "all") -> str:
    return f"depth_{scans}_{proc}_{kind}"


def compute_depth_frame(
    scans_xyz: Sequence[np.ndarray],
    scan_poses: np.ndarray,
    ref_pose: np.ndarray,
    calib: Calibration,
    img_hw: tuple[int, int],
    proc: str = "LA",
    idw_window: int = 4,
    bottom_scans_xyz: Sequence[np.ndarray] | None = None,
    bottom_poses: np.ndarray | None = None,
) -> np.ndarray:
    """One frame's dense depth map in metres [H, W] (0 = empty)."""
    n = min(len(s) for s in scans_xyz)
    stack = np.stack([s[:n] for s in scans_xyz])
    l2r = np.asarray(calib.lidar2camrect, np.float32)
    if l2r.shape == (3, 4):
        l2r = np.vstack([l2r, [0, 0, 0, 1]])
    depth = np.asarray(
        accumulate_and_project(
            jnp.asarray(stack), jnp.asarray(scan_poses),
            jnp.asarray(ref_pose), jnp.asarray(l2r), img_hw,
        )
    )
    if proc == "LA":
        return depth
    if proc != "LAIDW":
        raise ValueError(f"Unknown proc mode: {proc}")
    # bottom-1/3 refill from the long accumulation window
    if bottom_scans_xyz is not None and len(bottom_scans_xyz):
        nb = min(len(s) for s in bottom_scans_xyz)
        bstack = np.stack([s[:nb] for s in bottom_scans_xyz])
        bottom = np.asarray(
            accumulate_and_project(
                jnp.asarray(bstack), jnp.asarray(bottom_poses),
                jnp.asarray(ref_pose), jnp.asarray(l2r), img_hw,
            )
        )
        H = img_hw[0]
        cut = 2 * H // 3
        merged = depth.copy()
        region = merged[cut:]
        merged[cut:] = np.where(region > 0, region, bottom[cut:])
        depth = merged
    return np.asarray(idw_densify(None, depth=jnp.asarray(depth), window=idw_window))


def save_depth_png(path: str, depth_m: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    mm = np.clip(depth_m * 1000.0, 0, 65535).astype(np.uint16)
    Image.fromarray(mm).save(path)


def build_sequence_depth(
    root: str,
    seq: str,
    frames: Sequence[int],
    scans: int = 5,
    proc: str = "LA",
    cam: str = cc.DEFAULT_CAM,
    out_root: str | None = None,
    skip_existing: bool = True,
    workers: int = 1,
) -> list[str]:
    """Generate depth labels for a sequence; returns written paths.

    ``workers`` > 1 processes frames on a thread pool — the scan loads are
    I/O and the jitted projection releases the GIL during device compute
    (the host-parallel equivalent of the reference's Pool(24),
    build_dense_depth.py:574).
    """
    out_root = out_root or root
    calib = load_calibration(root, seq, cam)
    poses = load_poses(root, seq)
    out_dir = os.path.join(
        out_root, depth_label_dirname(scans, proc), cam, str(seq)
    )
    half = scans // 2

    def one(frame: int) -> str | None:
        out_path = os.path.join(out_dir, f"{frame}.png")
        if skip_existing and os.path.exists(out_path):
            return None
        ids = np.clip(np.arange(frame - half, frame - half + scans), 0,
                      len(poses) - 1)
        scans_xyz = [load_scan(root, seq, int(i)) for i in ids]
        bottom_xyz, bottom_poses = None, None
        if proc == "LAIDW":
            bids = np.clip(np.arange(frame - 25, frame + 25), 0, len(poses) - 1)
            bottom_xyz = [load_scan(root, seq, int(i)) for i in bids]
            bottom_poses = poses[bids]
        depth = compute_depth_frame(
            scans_xyz, poses[ids], poses[frame], calib, calib.img_hw,
            proc=proc, bottom_scans_xyz=bottom_xyz, bottom_poses=bottom_poses,
        )
        save_depth_png(out_path, depth)
        return out_path

    from creste_public_tpu.utils.concurrency import parallel_map

    return [r for r in parallel_map(one, frames, workers) if r is not None]
