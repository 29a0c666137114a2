"""Pure-function camera / LiDAR / BEV geometry for the CREStE pipeline.

Parity targets (reference = ut-amrl/creste_public):
  - pixel backprojection:      creste/models/blocks/splat_projection.py:19-51
  - lidar->map frame + voxels: creste/models/blocks/splat_projection.py:81-88,175-189
  - trapezoidal FOV mask:      creste/utils/train_utils.py:511-560
  - earliest pose in FOV:      creste/utils/train_utils.py:765-800

All functions are jit-compatible (static shapes, no data-dependent Python
control flow) and operate in channels-last layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def backproject_depth(depth: Array, p2p: Array) -> Array:
    """Lift a depth image into 3-D points in the LiDAR frame.

    Follows the reference Camera2World: homogeneous pixel rays [u, v, 1] are
    scaled by depth to [u*d, v*d, d, 1] and mapped by the 4x4 pixel-to-point
    matrix ``p2p`` (which folds in the inverse camera intrinsics and the
    camera->LiDAR extrinsics, pre-scaled for the feature downsample).

    Args:
      depth: [..., H, W] metric depth (meters).
      p2p:   [..., 4, 4] pixel->point homogeneous transform.

    Returns:
      xyz: [..., H, W, 3] points in the LiDAR frame.
    """
    *batch, H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ones = jnp.ones((H, W), jnp.float32)
    # [H, W, 4] homogeneous scaled pixels: (u*d, v*d, d, 1)
    d = depth.astype(jnp.float32)
    pix = jnp.stack([u * d, v * d, d, jnp.broadcast_to(ones, d.shape)], axis=-1)
    # xyz_h[..., h, w, i] = sum_j p2p[..., i, j] * pix[..., h, w, j]
    xyz = jnp.einsum("...ij,...hwj->...hwi", p2p.astype(jnp.float32), pix)
    return xyz[..., :3]


def lidar_to_map_matrix(min_bound: np.ndarray) -> np.ndarray:
    """Fixed LiDAR->map-frame SE(3): axis swap + recenter to the grid origin.

    Reference: splat_projection.py:81-88. Maps LiDAR (x fwd, y left, z up) to
    map frame where row0 = -y - xmin, row1 = -x - ymin, row2 = -z - zmin.
    """
    xmin, ymin, zmin = (float(min_bound[0]), float(min_bound[1]),
                        float(min_bound[2]))
    return np.array(
        [
            [0.0, -1.0, 0.0, -xmin],
            [-1.0, 0.0, 0.0, -ymin],
            [0.0, 0.0, -1.0, -zmin],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def points_to_voxels(points: Array, lidar2map: Array, voxel_size_xy: Array) -> Array:
    """Continuous (fractional) 2-D voxel coordinates of LiDAR-frame points.

    Reference: splat_projection.py:175-189 (`_points_to_voxels`).

    Args:
      points: [..., 3] LiDAR-frame points.
      lidar2map: [4, 4] fixed map transform (see lidar_to_map_matrix).
      voxel_size_xy: [2] metres per voxel in (x, y).

    Returns:
      [..., 2] float voxel coords (not floored; the splat bilinear-weights them).
    """
    R = lidar2map[:2, :3]
    t = lidar2map[:2, 3]
    xy = jnp.einsum("ij,...j->...i", R, points) + t
    return xy / voxel_size_xy


def point_in_range_mask(points: Array, min_bound: Array, max_bound: Array) -> Array:
    """Boolean mask of points inside [min_bound, max_bound) per axis.

    Reference semantics (splat_projection.py:169): ``(p < max) & (p >= min)``.
    """
    return jnp.all((points < max_bound) & (points >= min_bound), axis=-1)


def create_trapezoidal_fov_mask(
    H: int,
    W: int,
    fov_top_angle: float = 50.0,
    fov_bottom_angle: float = 40.0,
    near: float = 10.0,
    far: float = 50.0,
) -> np.ndarray:
    """North-facing trapezoidal field-of-view mask (NumPy, host-side constant).

    Reference: train_utils.py:511-560. Angular spread interpolates linearly
    from ``fov_top_angle`` at ``near`` to ``fov_bottom_angle`` at ``far``.
    """
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    cx, cy = W / 2.0, H / 2.0
    dist = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    ang = np.arctan2(x - cx, cy - y) * 180.0 / np.pi
    ang = np.where(ang < -180.0, ang + 360.0, ang)

    spread_top = np.full_like(dist, fov_top_angle / 2.0)
    spread_bot = np.full_like(dist, fov_bottom_angle / 2.0)
    frac = (dist - near) / (far - near)
    spread = np.where(
        dist <= near,
        spread_top,
        np.where(dist >= far, spread_bot, spread_top + (spread_bot - spread_top) * frac),
    )
    mask = (dist >= near) & (dist <= far) & (np.abs(ang) <= spread)
    return mask


def earliest_pose_in_fov(expert_xy: Array, fov_mask: Array) -> Array:
    """First expert pose (in time) that lies inside the FOV mask.

    Reference: train_utils.py:765-800. Falls back to (H-1, W//2) when no pose
    is inside the mask.

    Args:
      expert_xy: [B, T, 2] integer grid coords (row, col).
      fov_mask: [H, W] boolean.

    Returns:
      [B, 2] selected pose per batch element.
    """
    B, T, _ = expert_xy.shape
    H, W = fov_mask.shape
    xs = jnp.clip(expert_xy[..., 0].astype(jnp.int32), 0, H - 1)
    ys = jnp.clip(expert_xy[..., 1].astype(jnp.int32), 0, W - 1)
    valid = fov_mask[xs, ys]  # [B, T]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    idx = jnp.where(valid, t_idx, T)
    earliest = jnp.min(idx, axis=1)  # [B]
    none_valid = earliest == T
    earliest = jnp.where(none_valid, 0, earliest)
    sel = jnp.stack(
        [jnp.take_along_axis(xs, earliest[:, None], axis=1)[:, 0],
         jnp.take_along_axis(ys, earliest[:, None], axis=1)[:, 0]],
        axis=1,
    )
    fallback = jnp.array([H - 1, W // 2], jnp.int32)
    return jnp.where(none_valid[:, None], fallback[None, :], sel)


# ---------------------------------------------------------------------------
# Pose utilities (host-side NumPy; used by the data layer)
# ---------------------------------------------------------------------------

def quat_to_matrix(qw: float, qx: float, qy: float, qz: float) -> np.ndarray:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )


def pose7_to_matrix(pose: np.ndarray) -> np.ndarray:
    """[ts?, x, y, z, qw, qx, qy, qz] (CODa dense pose row) -> 4x4 SE(3).

    Accepts either 7 values (x y z qw qx qy qz) or 8 (leading timestamp);
    reference: creste/datasets/coda_helpers.py:74 (convert_poses_to_tf).
    """
    pose = np.asarray(pose, dtype=np.float64)
    if pose.shape[-1] == 8:
        pose = pose[..., 1:]
    x, y, z, qw, qx, qy, qz = pose
    T = np.eye(4)
    T[:3, :3] = quat_to_matrix(qw, qx, qy, qz)
    T[:3, 3] = [x, y, z]
    return T


def relative_poses(poses: np.ndarray, ref_idx: int = 0) -> np.ndarray:
    """Express a chain of 4x4 world poses relative to poses[ref_idx]."""
    ref_inv = np.linalg.inv(poses[ref_idx])
    return np.einsum("ij,njk->nik", ref_inv, poses)


def se3_to_bev_se2(
    pose: np.ndarray, lidar2map: np.ndarray, voxel_size_xy: np.ndarray
) -> np.ndarray:
    """Project a relative SE(3) pose into a 3x3 SE(2) on the BEV grid.

    The translation lands in (row, col) grid units; rotation keeps the yaw
    component after the lidar->map axis swap. Reference behaviour:
    codapefree_dataloader.py:579-615 (`_load_traverse` / T_lidar_to_bev).
    """
    T_map = lidar2map @ pose @ np.linalg.inv(lidar2map)
    out = np.eye(3)
    out[:2, :2] = T_map[:2, :2]
    grid_t = (lidar2map[:2, :3] @ pose[:3, 3] + lidar2map[:2, 3]) / voxel_size_xy
    out[:2, 2] = grid_t
    return out
