"""LiDAR -> camera depth-map projection (z-buffer) and scan accumulation.

Parity targets: creste/utils/projection.py:64-146 (`pixels_to_depth`:
project LiDAR points through `lidar2camrect`, keep in-bounds points with
positive camera z, per-pixel reduce over depth with max priority — the
reference's torch_scatter.scatter(reduce='max') — 0 means empty) and
scripts/preprocessing/build_dense_depth.py:224-366 (multi-scan accumulation
into a reference frame via pose chains).

TPU-first design: one jittable static-shape kernel — invalid points are
masked to a dump pixel (index 0 with weight/identity value), the per-pixel
reduce is a scatter-max/min over the linearised image, vmap handles the
batch axis. No dynamic filtering anywhere; depth for empty pixels is 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("img_hw", "reduce"))
def points_to_depth(
    points: Array,
    lidar2camrect: Array,
    img_hw: tuple[int, int],
    reduce: str = "max",
) -> Array:
    """Project a LiDAR point cloud to a sparse depth image.

    Args:
      points: [N, 3+] LiDAR-frame points (extra feature columns ignored).
      lidar2camrect: [3, 4] or [4, 4] rectified-camera projection.
      img_hw: (H, W) output size.
      reduce: 'max' (reference default: farthest wins) or 'min' (classic
        z-buffer: nearest wins).

    Returns [H, W] float32 depth in the camera frame; 0 = no point.
    """
    H, W = img_hw
    pts = points[:, :3].astype(jnp.float32)
    P = lidar2camrect[:3, :4].astype(jnp.float32)
    cam = pts @ P[:, :3].T + P[:, 3]
    z = cam[:, 2]
    # pixel coords by truncation toward zero (reference casts via int32)
    uv = (cam[:, :2] / jnp.where(z == 0, 1.0, z)[:, None]).astype(jnp.int32)
    u, v = uv[:, 0], uv[:, 1]
    valid = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)

    idx = jnp.where(valid, v * W + u, 0)
    if reduce == "max":
        fill = jnp.float32(0.0)
        val = jnp.where(valid, z, fill)
        flat = jnp.zeros((H * W,), jnp.float32)
        flat = flat.at[idx].max(val, mode="drop")
    elif reduce == "min":
        inf = jnp.float32(jnp.inf)
        val = jnp.where(valid, z, inf)
        flat = jnp.full((H * W,), inf, jnp.float32)
        flat = flat.at[idx].min(val, mode="drop")
        flat = jnp.where(jnp.isinf(flat), 0.0, flat)
    else:
        raise ValueError(f"Unknown reduce: {reduce}")
    return flat.reshape(H, W)


def accumulate_scans(
    scans: Array, poses: Array, ref_pose: Array
) -> Array:
    """Transform S scans into the reference frame and merge.

    Args:
      scans: [S, N, 3] LiDAR points per scan.
      poses: [S, 4, 4] world_from_lidar pose per scan.
      ref_pose: [4, 4] world_from_lidar of the reference frame.

    Returns [S*N, 3] points in the reference LiDAR frame
    (build_dense_depth.py:293 `transform_pc_frames` behaviour).
    """
    rel = jnp.linalg.inv(ref_pose) @ poses  # [S, 4, 4] ref_from_scan
    pts = jnp.einsum("sij,snj->sni", rel[:, :3, :3], scans[..., :3])
    pts = pts + rel[:, None, :3, 3]
    return pts.reshape(-1, 3)


@partial(jax.jit, static_argnames=("img_hw", "reduce"))
def accumulate_and_project(
    scans: Array,
    poses: Array,
    ref_pose: Array,
    lidar2camrect: Array,
    img_hw: tuple[int, int],
    reduce: str = "max",
) -> Array:
    """Fused accumulate + project (the build_dense_depth hot path:
    one jit, no host round-trips between the pose transform and the
    z-buffer scatter)."""
    merged = accumulate_scans(scans, poses, ref_pose)
    return points_to_depth(merged, lidar2camrect, img_hw, reduce)
