"""FOV overlap graph, visualization library, pointcloud renders."""
import os

import numpy as np

from creste_public_tpu.utils import geometry as geo
from creste_public_tpu.utils import visualization as vz
from creste_public_tpu.utils.pointcloud_vis import PointCloudFigure, render_scan


def se3(x, y, yaw):
    m = np.eye(4)
    m[0, 0] = np.cos(yaw); m[0, 1] = -np.sin(yaw)
    m[1, 0] = np.sin(yaw); m[1, 1] = np.cos(yaw)
    m[0, 3], m[1, 3] = x, y
    return m


def test_fov_overlap_same_pose_is_full():
    poses = np.stack([se3(0, 0, 0), se3(0.1, 0, 0)])
    se2 = np.zeros((2, 3, 3))
    se2[:, :2, :2] = poses[:, :2, :2]
    se2[:, :2, 2] = poses[:, :2, 3]
    frac = geo.fov_sector_overlap(se2[0], se2)
    assert frac[0] > 0.99
    assert frac[1] > 0.8  # nearly identical pose


def test_fov_overlap_decreases_with_distance_and_angle():
    db = np.stack([
        se3(0, 0, 0), se3(5, 0, 0), se3(10, 0, 0), se3(0, 0, np.pi),
        se3(100, 0, 0),
    ])
    idx = geo.get_overlapping_views(0, db, tp_min=0.05, tp_max=0.95)
    frac = geo.fov_sector_overlap(
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]]),
        np.stack([np.eye(3)] * 0 + [
            np.array([[1, 0, d], [0, 1, 0], [0, 0, 1.0]]) for d in (0, 5, 10)
        ]),
    )
    assert frac[0] > frac[1] > frac[2]
    assert 1 in idx and 4 not in idx
    # opposite-facing pose overlaps much less than forward neighbour
    all_frac = geo.fov_sector_overlap(
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]]),
        np.stack([
            np.array([[1, 0, 5], [0, 1, 0], [0, 0, 1.0]]),
            np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1.0]]),
        ]),
    )
    assert all_frac[0] > all_frac[1]


def test_visualization_renders(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 20, (32, 40)).astype(np.float32)
    depth[0, 0] = 0
    img = vz.colorize_depth(depth)
    assert img.shape == (32, 40, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()

    lab = rng.integers(0, 9, (32, 32))
    for kind in ("instance", "semantic"):
        out = vz.visualize_bev_label(lab, kind)
        assert out.shape == (32, 32, 3)
    elev = rng.normal(size=(16, 16, 2)).astype(np.float32)
    assert vz.visualize_bev_label(elev, "elevation").shape == (16, 32, 3)

    pol = np.abs(rng.normal(size=(16, 32, 8))).astype(np.float32)
    pol /= pol.sum(-1, keepdims=True)
    assert vz.visualize_bev_policy(pol).shape == (16, 32, 3)

    poses = np.tile(np.eye(3, dtype=np.float32), (5, 1, 1))
    poses[:, 0, 2] = np.arange(5) + 4
    poses[:, 1, 2] = 8
    base = np.zeros((32, 32, 3), np.uint8)
    drawn = vz.visualize_bev_poses(base, poses)
    assert (drawn[4:9, 8] == (255, 40, 40)).all(axis=-1).any()

    feats = rng.normal(size=(8, 8, 16)).astype(np.float32)
    assert vz.features_to_rgb(feats).shape == (8, 8, 3)

    combo = vz.side_by_side(img, vz.visualize_bev_label(lab))
    assert combo.shape[0] == 32

    p = str(tmp_path / "x.png")
    vz.save_png(p, img)
    assert os.path.getsize(p) > 100


def test_pointcloud_figure(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (500, 4)).astype(np.float32)
    path = str(tmp_path / "scan.png")
    render_scan(pts, path, size=2.0)
    assert os.path.getsize(path) > 1000

    hm = rng.normal(size=(16, 16)).astype(np.float32)
    hm[0, 0] = np.nan
    f = PointCloudFigure()
    f.draw_mesh_grid(hm)
    f.draw_trajectory(np.stack([np.arange(5.0)] * 3, axis=1))
    mesh_path = str(tmp_path / "mesh.png")
    f.save(mesh_path)
    assert os.path.getsize(mesh_path) > 1000


def test_show_elevation_map_modes():
    import numpy as np

    from creste_public_tpu.utils.visualization import show_elevation_map

    e = np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    e[0, 0] = np.inf
    rel = show_elevation_map(e, "relative")
    absm = show_elevation_map(e, "absolute")
    assert rel.shape == (16, 16, 3) and rel.dtype == np.uint8
    assert absm.shape == (16, 16, 3)


def test_visualize_elevation_3d_render():
    import numpy as np

    from creste_public_tpu.utils.visualization import visualize_elevation_3d

    pred = np.random.default_rng(0).normal(size=(24, 24)).astype(np.float32)
    gt = pred + 0.1
    gt[0, 0] = np.inf  # non-finite fill path
    img = visualize_elevation_3d(pred, gt)
    assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8
    assert img.std() > 0  # actually rendered something


def test_bev_heatmap_and_dino_composites():
    import numpy as np

    from creste_public_tpu.utils.visualization import (
        draw_bev_heatmap,
        save_preds_composite,
        visualize_dino_feature,
    )

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    hm = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    out = draw_bev_heatmap(hm, img)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    feats = rng.normal(size=(8, 8, 12)).astype(np.float32)
    comp = visualize_dino_feature(img, feats)
    assert comp.shape[0] == 16 and comp.shape[-1] == 3
    full = save_preds_composite(img, hm * 10.0, reward=hm)
    assert full.ndim == 3 and full.shape[-1] == 3


def test_sparse_depth_and_bev_map_panels():
    import numpy as np

    from creste_public_tpu.utils.visualization import (
        draw_sparse_depth_on_image,
        show_bev_map,
        visualize_action_label,
        visualize_rgbd_bev,
    )

    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    depth = np.zeros((16, 20), np.float32)
    depth[8, 10] = 5.0
    out = draw_sparse_depth_on_image(rgb, depth)
    assert out.shape == (16, 20, 3) and out.dtype == np.uint8
    assert (out[8, 10] != (rgb[8, 10] * 255).astype(np.uint8)).any()

    feats = rng.normal(size=(8, 8, 16)).astype(np.float32)
    dens = rng.uniform(0, 3, (8, 8)).astype(np.float32)
    panel = show_bev_map(feats, dens)
    assert panel.shape[0] == 8 and panel.shape[-1] == 3

    act = visualize_action_label(rng.uniform(0, 1, (10, 8)),
                                 rng.uniform(0, 1, (10, 8)))
    assert act.ndim == 3 and act.shape[-1] == 3

    xyz = rng.uniform(-10, 10, (16, 20, 3)).astype(np.float32)
    bev = visualize_rgbd_bev(rgb, xyz, map_range=12.8, grid=64)
    assert bev.shape == (64, 64, 3) and bev.sum() > 0


def test_pcd_masks_bbox_text(tmp_path):
    import numpy as np

    from creste_public_tpu.utils.visualization import (
        draw_bev_bbox,
        draw_text_on_image,
        numpy_to_pcd,
        show_masks_on_image,
    )

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    numpy_to_pcd(pts, path)
    text = open(path).read()
    assert "POINTS 20" in text and text.count("\n") >= 30

    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    lab = np.zeros((16, 16), np.int64)
    lab[4:8, 4:8] = 2
    over = show_masks_on_image(img, lab)
    assert over.dtype == np.uint8
    base = (img * 255).astype(np.uint8)
    assert (over[5, 5] != base[5, 5]).any()      # blended inside the mask
    assert (over[0, 0] == base[0, 0]).all()      # untouched outside

    boxed = draw_bev_bbox(base, (2, 2, 10, 10), (255, 0, 0))
    assert (boxed[2, 5] == [255, 0, 0]).all()

    txt = draw_text_on_image(base, "GT")
    assert txt.shape == base.shape and (txt != base).any()
