"""SAM image->BEV static pipeline tests (reference build_sam_map.py static
path, :635-783): depth-horizon unprojection, per-frame BEV lift, anchor-first
temporal merge — VERDICT round-1 item #3.
"""
import numpy as np

from creste_public_tpu.preprocessing.sam_map import (
    accumulate_instance_maps,
    backproject_depth_image,
    make_labels_contiguous,
    static_bev_map,
    static_bev_map_horizon,
)


def make_p2p(fx=40.0, cx=10.0, cy=8.0):
    """pixel->lidar: camera looks down lidar +x (see tests/test_coda_dataset)."""
    Kinv = np.array([[1 / fx, 0, -cx / fx], [0, 1 / fx, -cy / fx], [0, 0, 1.0]])
    R = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4)
    p2p[:3, :3] = R @ Kinv
    return p2p


def test_backproject_center_pixel():
    p2p = make_p2p()
    depth = np.full((16, 20), 2.0, np.float32)
    xyz = backproject_depth_image(depth, p2p)
    # principal pixel (row cy=8, col cx=10) -> straight ahead (x=d, y=0, z=0)
    np.testing.assert_allclose(xyz[8, 10], [2.0, 0.0, 0.0], atol=1e-6)
    # a pixel left of center (smaller u) -> +y (left) in lidar frame
    assert xyz[8, 5, 1] > 0


def test_static_bev_map_masks():
    p2p = make_p2p()
    depth = np.full((16, 20), 1.0, np.float32)
    sam = np.zeros((16, 20), np.uint16)
    sam[8, 10] = 3
    m = static_bev_map(sam, depth, p2p, grid=32, map_range=1.6)
    assert m.sum() > 0  # the labelled pixel landed
    # depth out of range -> nothing lands
    m2 = static_bev_map(sam, depth * 100.0, p2p, grid=32, map_range=1.6)
    assert m2.sum() == 0
    # static_mask False at the labelled pixel -> masked out
    mv = np.ones_like(sam, bool)
    mv[8, 10] = False
    m3 = static_bev_map(sam, depth, p2p, grid=32, map_range=1.6,
                        static_mask=mv)
    assert m3.sum() == 0


def test_horizon_merge_changes_output():
    """Temporal merging must add instances the anchor alone cannot see,
    keeping anchor ids for overlapping instances (VERDICT #3 done criterion)."""
    p2p = make_p2p()
    depth = np.full((16, 20), 1.0, np.float32)
    sam_a = np.zeros((16, 20), np.uint16)
    sam_a[8, 10] = 1  # instance seen from the anchor
    sam_b = np.zeros((16, 20), np.uint16)
    sam_b[8, 10] = 7  # same spot, different id in the other frame
    sam_b[8, 4] = 9   # novel instance only in the other frame

    # identical pose chain: frame b sees the same geometry
    single = static_bev_map_horizon(
        [(sam_a, depth, p2p)], grid=32, map_range=1.6)
    merged = static_bev_map_horizon(
        [(sam_a, depth, p2p), (sam_b, depth, p2p)], grid=32, map_range=1.6)

    assert (merged > 0).sum() > (single > 0).sum()
    # overlapping instance adopted the anchor's id: the anchor cell keeps 1
    anchor_cells = single == 1
    assert np.all(merged[anchor_cells] == 1)
    # novel instance got a fresh id distinct from the anchor's
    novel = merged[(merged != 0) & ~anchor_cells]
    assert len(novel) > 0 and np.all(novel != 1)


def test_horizon_pose_chaining():
    """A forward-moving second frame lands its pixels closer to the top
    (forward = decreasing row is NOT this builder's convention — the in-repo
    convention is row = (x + range)/voxel, so forward = increasing row)."""
    p2p = make_p2p()
    depth = np.full((16, 20), 1.0, np.float32)
    sam = np.zeros((16, 20), np.uint16)
    sam[8, 10] = 2
    pose_a = np.eye(4)
    pose_b = np.eye(4)
    pose_b[0, 3] = 0.5  # moved 0.5 m forward
    chained = np.linalg.inv(pose_a) @ pose_b @ p2p
    m_a = static_bev_map(sam, depth, p2p, grid=32, map_range=1.6)
    m_b = static_bev_map(sam, depth, chained, grid=32, map_range=1.6)
    ra = np.nonzero(m_a)[0].mean()
    rb = np.nonzero(m_b)[0].mean()
    assert rb - ra == 5  # 0.5 m / 0.1 m voxel = 5 rows forward


def test_make_labels_contiguous():
    m = np.array([[0, 5], [9, 5]])
    c = make_labels_contiguous(m)
    assert set(np.unique(c)) == {0, 1, 2}
    assert c[0, 1] == c[1, 1]


def test_accumulate_empty_and_single():
    m = np.zeros((4, 4), np.int32)
    out = accumulate_instance_maps([m, m])
    assert out.sum() == 0
