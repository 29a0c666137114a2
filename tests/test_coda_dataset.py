"""CODa on-disk reader tests against a synthesized mini dataset tree."""
import os
import pickle

import numpy as np
import pytest
import yaml

from creste_public_tpu.data.calib import (
    load_calibration,
    load_poses,
    poses_to_matrices,
    quat_to_rotmat,
)
from creste_public_tpu.data.coda_dataset import CodaDataset, remap_contiguous
from creste_public_tpu.data import coda_constants as cc


@pytest.fixture(scope="module")
def coda_root(tmp_path_factory):
    """Write a 2-frame CODa-layout tree."""
    root = tmp_path_factory.mktemp("coda")
    seq = "0"
    H, W, g = 64, 80, 32

    # calibration yamls
    cal = root / cc.CALIBRATION_DIR / seq
    cal.mkdir(parents=True)
    K = [72.0, 0.0, 40.0, 0.0, 72.0, 32.0, 0.0, 0.0, 1.0]
    P = [72.0, 0.0, 40.0, 0.0, 0.0, 72.0, 32.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    with open(cal / "calib_cam0_intrinsics.yaml", "w") as f:
        yaml.safe_dump(
            {
                "camera_matrix": {"rows": 3, "cols": 3, "data": K},
                "rectification_matrix": {
                    "rows": 3, "cols": 3,
                    "data": [1, 0, 0, 0, 1, 0, 0, 0, 1],
                },
                "projection_matrix": {"rows": 3, "cols": 4, "data": P},
                "image_height": H,
                "image_width": W,
            },
            f,
        )
    # lidar->cam: x_l fwd = z_c, y_l left = -x_c, z_l up = -y_c
    l2c = [0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0]
    Pm = np.asarray(P, np.float64).reshape(3, 4)
    l2c_m = np.vstack([np.asarray(l2c, np.float64).reshape(3, 4), [0, 0, 0, 1]])
    l2r = (Pm @ l2c_m).reshape(-1).tolist()
    with open(cal / "calib_os1_to_cam0.yaml", "w") as f:
        yaml.safe_dump(
            {
                "extrinsic_matrix": {"rows": 3, "cols": 4, "data": l2c},
                "projection_matrix": {"rows": 3, "cols": 4, "data": l2r},
            },
            f,
        )

    # poses: straight line +x, identity rotation
    poses = root / cc.POSES_DIR / "dense"
    poses.mkdir(parents=True)
    rows = []
    for i in range(20):
        rows.append([i * 0.1, i * 0.2, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    np.savetxt(poses / f"{seq}.txt", np.asarray(rows))

    # splits
    splits = root / cc.SPLITS_DIR
    splits.mkdir()
    with open(splits / "train.txt", "w") as f:
        f.write("0 0\n0 1\n")

    # images + depth
    from PIL import Image

    img_dir = root / cc.CAMERA_DIR / "cam0" / seq
    img_dir.mkdir(parents=True)
    dep_dir = root / "depth_5_LA_all" / "cam0" / seq
    dep_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fr in (0, 1):
        Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(img_dir / cc.frame_filename(cc.CAMERA_DIR, "cam0", seq, fr, "jpg"))
        depth = (rng.uniform(300, 3000, (H, W))).astype(np.uint16)
        Image.fromarray(depth).save(dep_dir / f"{fr}.png")

    # distillation features
    dist = root / cc.DISTILLATION_LABEL_DIR / "cam0" / seq
    dist.mkdir(parents=True)
    for fr in (0, 1):
        np.save(dist / f"{fr}.npy",
                rng.normal(size=(H // 4, W // 4, 16)).astype(np.float32))

    # BEV labels
    for d, arr in (
        (cc.SAM_LABEL_DIR, rng.integers(0, 9, (g, g)).astype(np.uint16)),
        (cc.SAM_DYNAMIC_LABEL_DIR,
         rng.integers(0, 5, (g, g, 3)).astype(np.uint16)),
        (cc.ELEVATION_LABEL_DIR, rng.normal(size=(g, g, 2)).astype(np.float32)),
    ):
        ddir = root / d / seq
        ddir.mkdir(parents=True)
        for fr in (0, 1):
            np.save(ddir / f"{fr}.npy", arr)

    # counterfactuals only for frame 0
    cf = root / cc.COUNTERFACTUAL_LABEL_DIR / seq
    cf.mkdir(parents=True)
    with open(cf / "0.pkl", "wb") as f:
        pickle.dump(
            {"trajectories": [np.ones((10, 2)), 2 * np.ones((5, 2))],
             "rank": [0, 1]},
            f,
        )
    return str(root)


def make_cfg(root):
    return {
        "root": root, "views": 1, "ds": 4, "grid": 32, "map_range": 1.6,
        "horizon": 10, "n_counterfactuals": 4,
    }


def test_sample_contract(coda_root):
    ds = CodaDataset(make_cfg(coda_root), split="train")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (1, 64, 80, 4)
    assert s["depth_label"].shape == (1, 64, 80)
    assert s["fimg_label"].shape == (1, 16, 20, 16)
    assert s["p2p"].shape == (1, 4, 4)
    assert s["fov_mask"].shape == (32, 32)
    assert s["3d_sam_label"].shape == (32, 32)
    assert s["3d_sam_dynamic_label"].shape == (32, 32, 3)
    assert s["elevation_label"].shape == (32, 32, 2)
    assert s["traversability_label"].shape == (10, 3, 3)
    cfd = s["counterfactuals_label"]
    assert cfd["trajectories"].shape == (4, 10, 2)
    assert cfd["valid"].tolist() == [True, True, False, False]
    # short trajectory padded by repeating its last point
    assert np.allclose(cfd["trajectories"][1][4:], 2.0)


def test_p2p_backprojects_to_lidar_frame(coda_root):
    ds = CodaDataset(make_cfg(coda_root), split="train")
    s = ds[0]
    p2p = s["p2p"][0]
    # principal point at depth d should land d forward in lidar x
    u, v, d = 40.0 / 4, 32.0 / 4, 5.0
    pt = p2p @ np.array([u * d * 4, v * d * 4, d, 1.0])
    # ds-scaled p2p expects feature-resolution pixels times depth
    pt2 = p2p @ np.array([u * d, v * d, d, 1.0])
    assert np.allclose(pt2[:3], [5.0, 0.0, 0.0], atol=1e-5) or np.allclose(
        pt[:3], [5.0, 0.0, 0.0], atol=1e-5
    )


def test_traversability_starts_at_grid_center(coda_root):
    ds = CodaDataset(make_cfg(coda_root), split="train")
    s = ds[0]
    t = s["traversability_label"]
    assert np.allclose(t[0, :2, 2], [16, 16])  # ego cell
    # forward +x motion decreases the BEV row (T_lidar_to_bev has -1 diag)
    assert t[-1, 0, 2] < t[0, 0, 2]


def test_pose_utils_roundtrip():
    rows = np.array([[0.0, 1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0]])
    m = poses_to_matrices(rows)
    assert np.allclose(m[0, :3, 3], [1, 2, 3])
    assert np.allclose(m[0, :3, :3], np.eye(3))
    q90 = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    r = quat_to_rotmat(q90)
    assert np.allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-7)


def test_remap_contiguous():
    lab = np.array([[0, 7, 7], [3, 0, 9]])
    out = remap_contiguous(lab)
    assert set(np.unique(out)) == {0, 1, 2, 3}
    assert (out[lab == 0] == 0).all()
    assert len(np.unique(out[lab == 7])) == 1


def test_multiview_sample(coda_root):
    cfg = make_cfg(coda_root)
    cfg["views"] = 2
    ds = CodaDataset(cfg, split="train")
    s = ds[0]
    assert s["image"].shape == (2, 64, 80, 4)
    assert s["p2p"].shape == (2, 4, 4)
    assert s["depth_label"].shape == (2, 64, 80)
    # anchor p2p unchanged; the second view's p2p is pose-chained
    base = CodaDataset(make_cfg(coda_root), split="train")[0]["p2p"][0]
    assert np.allclose(s["p2p"][0], base, atol=1e-5)


def test_epoch_loader_propagates_producer_errors():
    """A corrupt sample mid-epoch must raise at the consumer, not silently
    truncate the epoch (round-3 review finding)."""
    import pytest

    from creste_public_tpu.data.dataloader import EpochLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return {"x": np.zeros((2,), np.float32)}

    loader = EpochLoader(Bad(), 2, seed=0, shuffle=False)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader.epoch(0):
            pass


def test_epoch_loader_process_mode_matches_thread_mode():
    """worker_mode='process' (persistent spawn pool — the torch DataLoader
    worker equivalent for GIL-bound __getitem__ bodies) yields bit-identical
    batches to the in-process thread mode, including the deterministic
    per-sample transform rng."""
    from creste_public_tpu.data.augment import augment_sample
    from creste_public_tpu.data.dataloader import EpochLoader
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset

    cfg = {"image_size": [64, 80], "grid": 32, "map_range": 1.6,
           "fdn_dim": 16, "length": 6}
    kw = dict(batch_size=2, shuffle=True, seed=3, transform=augment_sample,
              num_workers=2)
    thread = EpochLoader(SyntheticCodaDataset(cfg=cfg), **kw)
    proc = EpochLoader(SyntheticCodaDataset(cfg=cfg), **kw,
                       worker_mode="process")
    try:
        a = list(thread.epoch(1))
        b = list(proc.epoch(1))
        assert len(a) == len(b) == 3
        for ba, bb in zip(a, b):
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_equal(ba[k], bb[k], err_msg=k)
        # the pool is persistent: a second epoch reuses it
        assert sum(1 for _ in proc.epoch(2)) == 3
    finally:
        proc.close()
    assert proc._pool is None
