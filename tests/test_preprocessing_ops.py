"""Unit tests for preprocessing kernels: depth projection, IDW infill,
elevation binning + gap-scan."""
import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.depth_projection import (
    accumulate_and_project,
    accumulate_scans,
    points_to_depth,
)
from creste_public_tpu.ops.elevation import (
    PROJ_CEILING,
    PROJ_GROUND,
    PROJ_SKY,
    bin_min_max_var,
    elevation_maps_from_points,
    lower_upper_elevation,
)
from creste_public_tpu.ops.infill import idw_densify


def simple_projection():
    # camera at lidar origin: x_l fwd = z_c; K with f=10, c=(8, 6)
    P = np.array(
        [[0, -10, 0, 8 * 1], [0, 0, -10, 6 * 1], [1, 0, 0, 0]], np.float64
    )
    # row i: cam x = -y_l, cam y = -z_l, cam z = x_l; P = K [R|t]
    K = np.array([[10, 0, 8], [0, 10, 6], [0, 0, 1.0]])
    Rt = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64)
    return K @ Rt


def test_points_to_depth_pixel_and_value():
    P = simple_projection()
    pts = np.array([[5.0, 0.0, 0.0]])  # straight ahead, 5 m
    depth = np.asarray(points_to_depth(jnp.asarray(pts), jnp.asarray(P), (12, 16)))
    assert depth[6, 8] == 5.0
    assert (depth > 0).sum() == 1


def test_points_to_depth_max_priority():
    P = simple_projection()
    pts = np.array([[5.0, 0.0, 0.0], [9.0, 0.0, 0.0]])
    d_max = np.asarray(points_to_depth(jnp.asarray(pts), jnp.asarray(P), (12, 16)))
    d_min = np.asarray(
        points_to_depth(jnp.asarray(pts), jnp.asarray(P), (12, 16), reduce="min")
    )
    assert d_max[6, 8] == 9.0  # reference depth_priority='max'
    assert d_min[6, 8] == 5.0


def test_points_behind_camera_dropped():
    P = simple_projection()
    pts = np.array([[-5.0, 0.0, 0.0]])
    depth = np.asarray(points_to_depth(jnp.asarray(pts), jnp.asarray(P), (12, 16)))
    assert (depth == 0).all()


def test_accumulate_scans_pose_chain():
    scans = np.zeros((2, 1, 3), np.float32)
    scans[1, 0] = [1.0, 0.0, 0.0]
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[1, 0, 3] = 2.0  # scan 1 taken 2 m ahead
    ref = np.eye(4, dtype=np.float32)
    merged = np.asarray(
        accumulate_scans(jnp.asarray(scans), jnp.asarray(poses), jnp.asarray(ref))
    )
    assert np.allclose(merged[0], [0, 0, 0])
    assert np.allclose(merged[1], [3.0, 0, 0])  # 1 m in scan frame + 2 m offset


def test_accumulate_and_project_fused():
    P = simple_projection()
    scans = np.array([[[5.0, 0.0, 0.0]]], np.float32)
    poses = np.eye(4, dtype=np.float32)[None]
    depth = np.asarray(
        accumulate_and_project(
            jnp.asarray(scans), jnp.asarray(poses),
            jnp.eye(4), jnp.asarray(P), (12, 16),
        )
    )
    assert depth[6, 8] == 5.0


def test_idw_exact_passthrough_and_interpolation():
    H, W = 20, 24
    depth = np.zeros((H, W), np.float32)
    depth[10, 10] = 2.0
    depth[10, 14] = 4.0
    out = np.asarray(idw_densify(None, depth=jnp.asarray(depth), window=4))
    # integer-pixel samples: the zero-distance self-weight is eps-clamped
    # (the reference's 1/sqrt(0) would NaN there), so the sample pixel is a
    # near-passthrough rather than an exact copy
    assert abs(out[10, 10] - 2.0) < 1e-3 and abs(out[10, 14] - 4.0) < 1e-3
    mid = out[10, 12]
    assert 2.0 < mid < 4.0
    assert abs(mid - 3.0) < 0.5  # symmetric neighbours -> near the mean
    # outside the window of any sample: zero
    assert out[0, 0] == 0.0


def test_idw_point_form_subpixel():
    uvd = np.array([[5.3, 6.7, 3.0]], np.float32)
    out = np.asarray(idw_densify(jnp.asarray(uvd), img_hw=(16, 16), window=2))
    assert abs(out[6, 5] - 3.0) < 0.2  # sample pixel dominated by own weight
    assert out[7, 5] > 0  # neighbour interpolated


def test_bin_min_max_var():
    z = jnp.asarray([0.0, 1.0, 2.0, 5.0])
    cell = jnp.asarray([0, 0, 0, 3])
    valid = jnp.asarray([True, True, True, True])
    zmin, zmax, var, cnt = bin_min_max_var(z, cell, valid, 4)
    assert zmin[0] == 0.0 and zmax[0] == 2.0
    assert abs(float(var[0]) - np.var([0, 1, 2])) < 1e-6
    assert zmin[3] == 5.0 and cnt[3] == 1
    assert np.isnan(float(zmin[1]))


def test_gap_scan_finds_overhang():
    # cell 0: ground points 0.0..0.2 then branch at 1.8..2.0 -> gap
    z = jnp.asarray([0.0, 0.1, 0.2, 1.8, 1.9, 5.0])
    cell = jnp.zeros((6,), jnp.int32)
    valid = jnp.ones((6,), bool)
    ground = jnp.zeros((1,))
    lower, upper, cls = lower_upper_elevation(
        z, cell, valid, ground, 1, sky_thres=2.0, gap_thres=0.5,
        min_overhang=0.5,
    )
    assert abs(float(lower[0]) - 0.2) < 1e-6
    assert abs(float(upper[0]) - 1.8) < 1e-6
    cls = np.asarray(cls)
    assert (cls[:3] == PROJ_GROUND).all()
    # the gap-discovery point (1.8) is never classified by the reference
    # scan and stays SKY; only points AFTER it become ceiling
    assert cls[3] == PROJ_SKY
    assert cls[4] == PROJ_CEILING
    assert cls[5] == PROJ_SKY  # 5.0 > sky threshold


def test_gap_scan_no_overhang():
    z = jnp.asarray([0.0, 0.3, 0.35])
    cell = jnp.zeros((3,), jnp.int32)
    valid = jnp.ones((3,), bool)
    lower, upper, cls = lower_upper_elevation(
        z, cell, valid, jnp.zeros((1,)), 1, gap_thres=0.5
    )
    assert abs(float(lower[0]) - 0.35) < 1e-6
    assert float(upper[0]) == 2.0  # sky threshold
    assert (np.asarray(cls) == PROJ_GROUND).all()


def test_gap_scan_first_point_too_high():
    z = jnp.asarray([1.5, 1.6])
    cell = jnp.zeros((2,), jnp.int32)
    valid = jnp.ones((2,), bool)
    lower, upper, cls = lower_upper_elevation(
        z, cell, valid, jnp.zeros((1,)), 1
    )
    assert np.isnan(float(lower[0]))
    assert (np.asarray(cls) == PROJ_SKY).all()


def test_elevation_maps_from_points_shapes():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 0.2, 500)
    maps = elevation_maps_from_points(jnp.asarray(pts), (32, 32), 1.6)
    for k, v in maps.items():
        assert v.shape == (32, 32), k
    filled = ~np.isnan(np.asarray(maps["elevation_min"]))
    assert filled.sum() > 100
