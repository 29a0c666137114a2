import numpy as np
import jax.numpy as jnp

from creste_public_tpu.utils import geometry as geo


def test_backproject_identity_p2p():
    # p2p = identity: xyz = (u*d, v*d, d)
    depth = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)[None]  # [1, 2, 2]
    p2p = np.eye(4, dtype=np.float32)[None]
    xyz = np.asarray(geo.backproject_depth(jnp.asarray(depth), jnp.asarray(p2p)))
    assert xyz.shape == (1, 2, 2, 3)
    # pixel (v=0, u=1): d=2 -> (u*d, v*d, d) = (2, 0, 2)
    np.testing.assert_allclose(xyz[0, 0, 1], [2.0, 0.0, 2.0], atol=1e-6)
    # pixel (v=1, u=0): d=3 -> (0, 3, 3)
    np.testing.assert_allclose(xyz[0, 1, 0], [0.0, 3.0, 3.0], atol=1e-6)


def test_backproject_translation():
    depth = np.full((1, 1, 1), 5.0, np.float32)
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, 3] = [10.0, 20.0, 30.0]
    xyz = np.asarray(geo.backproject_depth(jnp.asarray(depth), jnp.asarray(p2p[None])))
    np.testing.assert_allclose(xyz[0, 0, 0], [10.0, 20.0, 35.0], atol=1e-5)


def test_points_to_voxels_matches_reference_frame():
    # Standard CREStE grid: range [-12.8, 12.8], voxel 0.1 -> 256 cells
    l2m = geo.lidar_to_map_matrix(np.array([-12.8, -12.8, -2.0]))
    pts = jnp.asarray(np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 0.5]], np.float32))
    xy = np.asarray(geo.points_to_voxels(pts, jnp.asarray(l2m), jnp.asarray([0.1, 0.1])))
    # origin -> centre of grid (128, 128)
    np.testing.assert_allclose(xy[0], [128.0, 128.0], atol=1e-4)
    # x=1 (fwd), y=2 (left): col = (-y+12.8)/0.1 = 108, row = (-x+12.8)/0.1 = 118
    np.testing.assert_allclose(xy[1], [108.0, 118.0], atol=1e-3)


def test_point_in_range_mask():
    mn = jnp.asarray([-1.0, -1.0, -1.0])
    mx = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray(
        np.array(
            [[0, 0, 0], [1.0, 0, 0], [-1.0, 0, 0], [0, 2.0, 0]], np.float32
        )
    )
    m = np.asarray(geo.point_in_range_mask(pts, mn, mx))
    # upper bound exclusive, lower bound inclusive (reference semantics)
    np.testing.assert_array_equal(m, [True, False, True, False])


def test_fov_mask_shape_and_symmetry():
    m = geo.create_trapezoidal_fov_mask(128, 128, 70, 70, 0, 100)
    assert m.shape == (128, 128)
    assert m.any()
    # Nearly symmetric about the vertical centreline (centre sits at W/2 on
    # an even-width grid, exactly as in the reference, so allow edge cells)
    assert (m != m[:, ::-1]).mean() < 0.02
    # Nothing beyond far radius
    assert not m[127, 0]


def test_earliest_pose_in_fov_and_fallback():
    H = W = 16
    mask = np.zeros((H, W), bool)
    mask[4:8, 6:10] = True
    expert = np.array([[[0, 0], [5, 7], [6, 8]]], np.int32)  # first pose outside
    sel = np.asarray(
        geo.earliest_pose_in_fov(jnp.asarray(expert), jnp.asarray(mask))
    )
    np.testing.assert_array_equal(sel[0], [5, 7])
    # no pose in fov -> fallback (H-1, W//2)
    expert2 = np.array([[[0, 0], [1, 1]]], np.int32)
    sel2 = np.asarray(
        geo.earliest_pose_in_fov(jnp.asarray(expert2), jnp.asarray(mask))
    )
    np.testing.assert_array_equal(sel2[0], [H - 1, W // 2])


def test_pose7_roundtrip():
    T = geo.pose7_to_matrix(np.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    # 90 deg about z
    q = np.array([0.0, 0.0, 0.0, np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    T2 = geo.pose7_to_matrix(q)
    np.testing.assert_allclose(T2[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_relative_poses():
    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [1.0, 0, 0]
    rel = geo.relative_poses(np.stack([a, b]), 0)
    np.testing.assert_allclose(rel[1][:3, 3], [1.0, 0, 0])
    rel2 = geo.relative_poses(np.stack([a, b]), 1)
    np.testing.assert_allclose(rel2[0][:3, 3], [-1.0, 0, 0])
