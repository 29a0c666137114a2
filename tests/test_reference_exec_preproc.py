"""Reference-exec oracle, wave 2: preprocessing/geometry algorithms.

Same methodology as test_reference_exec.py (AST-extract the reference's own
functions at test time, execute with stubbed imports, compare against the
TPU-native implementations): the numba elevation gap-scan, the DenseDepthMap
IDW infill, the LiDAR->camera z-buffer projection, and the channel remap.
"""
from __future__ import annotations

from pathlib import Path

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
