"""SSC/SOC SemanticMap label-builder tests (reference build_feature_map.py).

Covers: image->point label transfer, global accumulation + ego crop, count
binning with the BEV flip, the on-disk contract consumed by
CodaDataset._load_count_bin, and a CE-head training step on the produced
labels (the full round trip of VERDICT round-1 item #2).
"""
import os

import numpy as np
import pytest
import yaml

from creste_public_tpu.data import coda_constants as cc
from creste_public_tpu.preprocessing.semantic_map import (
    SemanticPointMap,
    build_count_bins,
    labels_from_image,
    project_points_to_pixels,
)


def test_project_points_to_pixels_center():
    # camera looking down lidar +x: u = fx*(-y)/x + cx, v = fy*(-z)/x + cy
    P = np.array([[72.0, 0, 40, 0], [0, 72.0, 32, 0], [0, 0, 1, 0]])
    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1.0]])
    l2r = P @ l2c
    pts = np.array([
        [2.0, 0.0, 0.0],   # straight ahead -> principal point (40, 32)
        [2.0, 1.0, 0.0],   # left -> u = 40 - 36 = 4
        [-1.0, 0.0, 0.0],  # behind camera -> masked
    ])
    uv, mask = project_points_to_pixels(pts, l2r, 64, 80)
    assert mask.tolist() == [True, True, False]
    assert uv[0].tolist() == [40, 32]
    assert uv[1].tolist() == [4, 32]


def test_labels_from_image_gather():
    P = np.array([[72.0, 0, 40, 0], [0, 72.0, 32, 0], [0, 0, 1, 0]])
    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1.0]])
    img = np.zeros((64, 80), np.int64)
    img[32, 40] = 7
    labels, mask = labels_from_image(
        np.array([[2.0, 0, 0], [-1.0, 0, 0]]), img, P @ l2c)
    assert labels[0, 0] == 7 and mask[0]
    assert labels[1, 0] == 0 and not mask[1]


def test_scene_counts_and_flip():
    """A labelled point 1 m ahead of the ego pose lands in the front half of
    the BEV grid after the reference's flip, with the right class count."""
    smap = SemanticPointMap((32, 32), (0.1, 0.1), (-1.6, -1.6, 1.6, 1.6))
    pts = np.repeat(np.array([[1.0, 0.0, 0.0]]), 3, axis=0)
    smap.add_frame(pts, np.full((3,), 5, np.int64), np.eye(4))
    scene = smap.scene_at_pose(np.eye(4), num_classes=8)
    assert scene.shape == (32, 32, 8)
    assert scene.sum() == 3
    # pre-flip voxel: x=1.0 -> (1.0+1.6)/0.1 = 26; y=0 -> 16
    # flip [0,1]: row 31-26=5, col 31-16=15
    assert scene[5, 15, 5] == 3


def test_crop_follows_pose():
    """Points enter/leave the ego window as the pose moves (global map)."""
    smap = SemanticPointMap((32, 32), (0.1, 0.1), (-1.6, -1.6, 1.6, 1.6))
    smap.add_frame(np.array([[1.0, 0.0, 0.0]]), np.array([3]), np.eye(4))
    far = np.eye(4)
    far[0, 3] = 10.0
    local, labels = smap.crop_at_pose(far)
    assert len(local) == 0
    near = np.eye(4)
    near[0, 3] = 0.5
    local, labels = smap.crop_at_pose(near)
    assert len(local) == 1 and abs(local[0, 0] - 0.5) < 1e-6


def test_max_z_and_label_filters():
    smap = SemanticPointMap((32, 32), (0.1, 0.1), (-1.6, -1.6, 1.6, 1.6),
                            max_z=3.0)
    pts = np.array([[1.0, 0, 0], [1.0, 0, 5.0], [1.0, 0.5, 0]])
    smap.add_frame(pts, np.array([2, 2, 0]), np.eye(4))
    # z=5 filtered by max_z; label 0 filtered by filter_labels
    assert sum(len(p) for p in smap._points) == 1


@pytest.fixture(scope="module")
def ssc_tree(tmp_path_factory):
    """Synthetic on-disk tree: calib + poses + labelled scans."""
    root = tmp_path_factory.mktemp("ssc")
    seq = "0"
    cal = root / cc.CALIBRATION_DIR / seq
    cal.mkdir(parents=True)
    P = [72.0, 0.0, 40.0, 0.0, 0.0, 72.0, 32.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    l2c = [0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0]
    Pm = np.asarray(P).reshape(3, 4)
    l2cm = np.vstack([np.asarray(l2c, np.float64).reshape(3, 4), [0, 0, 0, 1]])
    with open(cal / "calib_cam0_intrinsics.yaml", "w") as f:
        yaml.safe_dump({
            "camera_matrix": {"rows": 3, "cols": 3,
                              "data": [72.0, 0, 40, 0, 72.0, 32, 0, 0, 1]},
            "rectification_matrix": {"rows": 3, "cols": 3,
                                     "data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
            "projection_matrix": {"rows": 3, "cols": 4, "data": P},
            "image_height": 64, "image_width": 80}, f)
    with open(cal / "calib_os1_to_cam0.yaml", "w") as f:
        yaml.safe_dump({
            "extrinsic_matrix": {"rows": 3, "cols": 4, "data": l2c},
            "projection_matrix": {
                "rows": 3, "cols": 4,
                "data": (Pm @ l2cm).reshape(-1).tolist()}}, f)

    poses = root / cc.POSES_DIR / "dense"
    poses.mkdir(parents=True)
    rows = [[i * 0.1, i * 0.2, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
            for i in range(4)]
    np.savetxt(poses / f"{seq}.txt", np.asarray(rows))

    splits = root / cc.SPLITS_DIR
    splits.mkdir()
    with open(splits / "train.txt", "w") as f:
        f.write("0 1\n")

    rng = np.random.default_rng(0)
    scan_dir = root / cc.POINTCLOUD_DIR / cc.DEFAULT_LIDAR / seq
    scan_dir.mkdir(parents=True)
    lab_dir = root / "3d_semantic" / seq
    lab_dir.mkdir(parents=True)
    N = 256
    for fr in range(4):
        xyz = np.zeros((N, cc.OUSTER_FEATURES), np.float32)
        xyz[:, 0] = rng.uniform(0.3, 1.5, N)
        xyz[:, 1] = rng.uniform(-1.0, 1.0, N)
        xyz[:, 2] = rng.uniform(-0.5, 0.5, N)
        path = cc.frame_path(str(root), cc.POINTCLOUD_DIR, cc.DEFAULT_LIDAR,
                             seq, fr, "bin")
        xyz.reshape(-1).tofile(path)
        labels = rng.integers(1, 25, N).astype(np.uint32)
        labels.tofile(lab_dir / f"{fr}.bin")
    return str(root)


def test_build_count_bins_roundtrip(ssc_tree):
    """Builder -> on-disk bins -> CodaDataset._load_count_bin -> CE-head
    gradient step (the reference's 3d_ssc task end to end)."""
    n = build_count_bins(
        ssc_tree, "0", "3d_semantic",
        out_dir=os.path.join(ssc_tree, cc.SSC_LABEL_DIR),
        grid=32, map_range=1.6, num_classes=25, out_dtype="int64",
        window=2, chunk=2,
    )
    assert n == 4
    raw = np.fromfile(
        os.path.join(ssc_tree, cc.SSC_LABEL_DIR, "0", "1.bin"), np.int64)
    assert raw.size == 32 * 32 * 25 and raw.sum() > 0

    from creste_public_tpu.data.coda_dataset import CodaDataset
    from creste_public_tpu.data.taxonomy import NUM_SEM_REMAPPED

    ds = CodaDataset({"root": ssc_tree, "views": 1, "ds": 4, "grid": 32,
                      "map_range": 1.6, "horizon": 2})
    t = ds._load_count_bin(cc.SSC_LABEL_DIR, "0", 1, remap="sem")
    assert t.shape == (32, 32, NUM_SEM_REMAPPED)
    assert t.sum() == raw.sum()  # remap_and_sum conserves counts

    # idempotency: re-running skips existing files
    assert build_count_bins(
        ssc_tree, "0", "3d_semantic",
        out_dir=os.path.join(ssc_tree, cc.SSC_LABEL_DIR),
        grid=32, map_range=1.6, num_classes=25, window=2, chunk=2) == 0

    # CE head trains on the produced label
    import jax
    import jax.numpy as jnp

    from creste_public_tpu.losses.manager import LossManager

    lm = LossManager({"loss": [{"name": "CrossEntropy", "weight": 1.0,
                                "pred_key": "outputs/ssc_preds",
                                "lab_key": "inputs/3d_ssc_label",
                                "num_class": NUM_SEM_REMAPPED,
                                "class_dim": -1}]})
    label = jnp.asarray(t)[None]
    fov = jnp.ones((1, 32, 32), bool)
    params = jnp.zeros((NUM_SEM_REMAPPED,))

    def loss_fn(p):
        pred = jnp.zeros((1, 32, 32, NUM_SEM_REMAPPED)) + p
        td = {"outputs/ssc_preds": pred, "inputs/3d_ssc_label": label,
              "inputs/fov_mask": fov}
        loss_dict, _ = lm(td)
        return LossManager.total(loss_dict)

    g = jax.grad(loss_fn)(params)
    assert np.isfinite(float(loss_fn(params))) and np.abs(np.asarray(g)).sum() > 0


def test_build_count_bins_image_source(ssc_tree):
    """Per-pixel label images lift through the projection (feat_type image)."""
    lab_dir = os.path.join(ssc_tree, "2d_semantic", "0")
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    for fr in range(4):
        np.save(os.path.join(lab_dir, f"{fr}.npy"),
                rng.integers(1, 25, (64, 80)).astype(np.int64))
    n = build_count_bins(
        ssc_tree, "0", "2d_semantic",
        out_dir=os.path.join(ssc_tree, "3d_ssc_img"),
        grid=32, map_range=1.6, num_classes=25, window=2, chunk=4,
        label_source="image")
    assert n == 4
    raw = np.fromfile(os.path.join(ssc_tree, "3d_ssc_img", "0", "0.bin"),
                      np.int64)
    assert raw.sum() > 0


def test_aggregate_descriptors_gmp_gap():
    from creste_public_tpu.preprocessing.semantic_map import (
        aggregate_descriptors,
    )

    cells = np.array([[0, 0], [0, 0], [1, 2]])
    desc = np.array([[1.0, -2.0], [3.0, -5.0], [7.0, 7.0]])
    gmp = aggregate_descriptors(cells, desc, (2, 4), "GMP")
    assert gmp.shape == (2, 4, 2)
    np.testing.assert_allclose(gmp[0, 0], [3.0, -2.0])
    np.testing.assert_allclose(gmp[1, 2], [7.0, 7.0])
    assert gmp[1, 3].sum() == 0  # empty cell
    gap = aggregate_descriptors(cells, desc, (2, 4), "GAP")
    np.testing.assert_allclose(gap[0, 0], [2.0, -3.5])


def test_descriptor_scene_at_pose_flip():
    from creste_public_tpu.preprocessing.semantic_map import (
        SemanticPointMap,
        descriptor_scene_at_pose,
    )

    smap = SemanticPointMap((32, 32), (0.1, 0.1), (-1.6, -1.6, 1.6, 1.6))
    pts = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    desc = np.array([[1.0, 4.0], [2.0, 3.0]], np.float32)
    smap.add_frame(pts, desc, np.eye(4), filter_labels=False)
    scene = descriptor_scene_at_pose(smap, np.eye(4), "GMP")
    assert scene.shape == (32, 32, 2)
    # same cell as the count test: flip -> (5, 15); GMP elementwise max
    np.testing.assert_allclose(scene[5, 15], [2.0, 4.0])


def test_build_descriptor_bins_roundtrip(ssc_tree):
    """FSC: per-pixel features -> points -> GMP bins -> dataset loader."""
    from creste_public_tpu.preprocessing.semantic_map import (
        build_descriptor_bins,
    )

    feat_dir = os.path.join(ssc_tree, "distillation", "cam0", "0")
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.default_rng(2)
    # feature maps at ds=4 of the 64x80 camera -> 16x20
    for fr in range(4):
        np.save(os.path.join(feat_dir, f"{fr}.npy"),
                rng.normal(size=(16, 20, 8)).astype(np.float32))
    n = build_descriptor_bins(
        ssc_tree, "0", "distillation/cam0",
        out_dir=os.path.join(ssc_tree, "3d_fsc"),
        grid=32, map_range=1.6, window=2, chunk=4, ds=4)
    assert n == 4

    from creste_public_tpu.data.coda_dataset import CodaDataset

    ds = CodaDataset({"root": ssc_tree, "views": 1, "ds": 4, "grid": 32,
                      "map_range": 1.6, "horizon": 2})
    fsc = ds._load_fsc("0", 1)
    assert fsc.shape == (32, 32, 8)
    assert np.abs(fsc).sum() > 0


def test_build_elevation_bins_roundtrip(ssc_tree):
    """Reference-shipped elevation labels: builder -> .bin f32 on-disk
    contract -> CodaDataset._load_elevation (min <= max where known, +inf
    where unknown, variance map alongside)."""
    from creste_public_tpu.preprocessing.semantic_map import (
        build_elevation_bins,
    )

    n = build_elevation_bins(
        ssc_tree, "0", "3d_semantic",
        out_dir=os.path.join(ssc_tree, cc.ELEVATION_LABEL_DIR),
        var_dir=os.path.join(ssc_tree, "variance"),
        grid=32, map_range=1.6, window=2, chunk=2,
    )
    assert n == 4
    raw = np.fromfile(
        os.path.join(ssc_tree, cc.ELEVATION_LABEL_DIR, "0", "1.bin"),
        np.float32)
    assert raw.size == 32 * 32 * 2
    var = np.fromfile(os.path.join(ssc_tree, "variance", "0", "1.bin"),
                      np.float32)
    assert var.size == 32 * 32 and np.isfinite(var).all()

    from creste_public_tpu.data.coda_dataset import CodaDataset

    ds = CodaDataset({"root": ssc_tree, "views": 1, "ds": 4, "grid": 32,
                      "map_range": 1.6, "horizon": 2})
    elev = ds._load_elevation("0", 1)
    assert elev.shape == (32, 32, 2) and elev.dtype == np.float32
    known = np.isfinite(elev[..., 0])
    assert known.any() and not known.all()
    assert (elev[..., 0][known] <= elev[..., 1][known] + 1e-6).all()
    assert np.isinf(elev[..., 0][~known]).all()

    # idempotent re-run
    assert build_elevation_bins(
        ssc_tree, "0", "3d_semantic",
        out_dir=os.path.join(ssc_tree, cc.ELEVATION_LABEL_DIR),
        var_dir=os.path.join(ssc_tree, "variance"),
        grid=32, map_range=1.6, window=2, chunk=2) == 0


def test_point_cloud_fload_keys(ssc_tree):
    """point_cloud + immovable_label fload keys (codapefree_dataloader.py:
    766-786) with static padding for collation."""
    from creste_public_tpu.data.coda_dataset import CodaDataset

    ds = CodaDataset({"root": ssc_tree, "views": 1, "ds": 4, "grid": 32,
                      "map_range": 1.6, "horizon": 2,
                      "load_point_cloud": True, "points_per_scan": 300})
    pc = ds._load_point_cloud("0", 1)
    mv = ds._load_immovable_label("0", 1)
    assert pc.shape == (300, 3) and pc.dtype == np.float32
    assert np.abs(pc[:256]).sum() > 0 and np.abs(pc[256:]).sum() == 0
    assert mv.shape == (300, 1) and mv.dtype == bool and mv.all()
    # movability bin present -> read back
    mvdir = os.path.join(ssc_tree, "3d_comp_movability", cc.DEFAULT_LIDAR, "0")
    os.makedirs(mvdir, exist_ok=True)
    flags = np.zeros((256,), bool)
    flags[:100] = True
    flags.tofile(os.path.join(mvdir, "1.bin"))
    mv2 = ds._load_immovable_label("0", 1)
    assert mv2[:100].all() and not mv2[100:256].any() and mv2[256:].all()
