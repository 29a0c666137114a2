"""Tests for splits, SAM-map merging/clustering, and PCA feature pipeline."""
import numpy as np
import jax.numpy as jnp

from creste_public_tpu.preprocessing import features as F
from creste_public_tpu.preprocessing import sam_map as sm
from creste_public_tpu.preprocessing import splits as sp


def straight_poses(n=120, step=0.1):
    mats = np.tile(np.eye(4), (n, 1, 1))
    mats[:, 0, 3] = np.arange(n) * step
    return mats


def curved_poses(n=120, step=0.1):
    mats = np.tile(np.eye(4), (n, 1, 1))
    t = np.arange(n) * step
    mats[:, 0, 3] = t
    mats[:, 1, 3] = 0.3 * t**2
    return mats


def test_classify_curvature():
    curved, straight, dists = sp.classify_curvature(
        straight_poses(), [0, 5], horizon=100, min_distance=3.0
    )
    assert straight == [0, 5] and curved == []
    curved, straight, _ = sp.classify_curvature(
        curved_poses(), [0], horizon=100, min_distance=3.0
    )
    assert curved == [0]


def test_classify_drops_short_and_backward():
    mats = straight_poses(120, step=0.001)  # barely moves
    curved, straight, _ = sp.classify_curvature(mats, [0], horizon=100)
    assert curved == [] and straight == []
    back = straight_poses()
    back[:, 0, 3] *= -1  # moves backwards
    curved, straight, _ = sp.classify_curvature(back, [0], horizon=100)
    assert curved == [] and straight == []


def test_train_val_test_partition():
    parts = sp.train_val_test(list(range(100)))
    assert len(parts["train"]) == 70
    assert len(parts["val"]) == 15
    assert len(parts["test"]) == 15
    assert sorted(parts["train"] + parts["val"] + parts["test"]) == list(range(100))
    assert parts["full"] == list(range(100))


def test_traversability_starts():
    rows = np.zeros((100, 8))
    rows[:, 4] = 1.0  # identity quaternion
    rows[:, 1] = np.arange(100) * 0.1  # forward 0.1 m/frame
    starts = sp.traversability_starts(rows, num_frames=50, dist_thresh=2.0)
    assert len(starts) == 50  # every start moves 5 m > 2 m
    rows_slow = rows.copy()
    rows_slow[:, 1] = np.arange(100) * 0.01
    assert len(sp.traversability_starts(rows_slow, 50, dist_thresh=2.0)) == 0


def test_label_overlap_merge():
    a = np.zeros((8, 8), np.int32)
    a[:4, :4] = 1
    b = np.zeros((8, 8), np.int32)
    b[:4, :5] = 7  # overlaps label 1
    b[6:, 6:] = 3  # novel
    merged, nxt = sm.merge_instance_maps(a, b, next_label=2)
    assert (merged[:4, :4] == 1).all()
    assert merged[0, 4] == 1  # overlapping new label adopted anchor id
    assert merged[7, 7] == 2  # novel label got the fresh id
    assert nxt == 3


def test_accumulate_instance_maps_chain():
    m1 = np.zeros((6, 6), np.int32); m1[:3, :3] = 1
    m2 = np.zeros((6, 6), np.int32); m2[1:4, 1:4] = 9
    m3 = np.zeros((6, 6), np.int32); m3[4:, 4:] = 2
    out = sm.accumulate_instance_maps([m1, m2, m3])
    assert (out[out > 0] > 0).all()
    assert out[1, 1] == 1  # m2's 9 adopted m1's 1
    assert out[3, 3] == 1  # filled from m2 under m1's id
    assert out[5, 5] == 2  # m3 novel id


def test_majority_label_map():
    pts = np.array([[0.05, 0.05, 0], [0.051, 0.052, 0], [0.049, 0.048, 0]])
    labels = np.array([2, 2, 5])
    m = sm.majority_label_map(pts, labels, grid=4, map_range=0.2)
    assert (m == 2).sum() == 1 and (m == 5).sum() == 0


def test_ground_plane_removal():
    rng = np.random.default_rng(0)
    ground = np.column_stack([
        rng.uniform(-5, 5, 500), rng.uniform(-5, 5, 500),
        rng.normal(0, 0.02, 500),
    ])
    obj = np.column_stack([
        rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50),
        rng.uniform(0.5, 1.5, 50),
    ])
    pts = np.vstack([ground, obj])
    keep = sm.remove_ground_plane(pts)
    assert keep[500:].mean() > 0.9  # objects kept
    assert keep[:500].mean() < 0.1  # ground removed


def test_dbscan_ensemble_and_matching():
    rng = np.random.default_rng(0)
    c1 = rng.normal([0, 0, 0], 0.03, (40, 3))
    c2 = rng.normal([5, 5, 0], 0.03, (40, 3))
    pts = np.vstack([c1, c2])
    clusters = sm.dbscan_ensemble(pts)
    assert len(np.unique(clusters[clusters > 0])) == 2
    inst = np.concatenate([np.full(40, 3), np.full(40, 8)])
    inst_noisy = inst.copy()
    inst_noisy[::7] = 0  # some unlabeled points
    out = sm.match_clusters_to_instances(clusters, inst_noisy)
    assert (out[:40] == 3).all() and (out[40:] == 8).all()


def test_pca_fit_project():
    rng = np.random.default_rng(0)
    # features living on a 2-D subspace of R^8
    basis = rng.normal(size=(2, 8))
    z = rng.normal(size=(500, 2))
    samples = z @ basis + 5.0
    mean, comps = F.pca_fit(jnp.asarray(samples.astype(np.float32)), k=2)
    assert comps.shape == (8, 2)
    # projection reconstructs the subspace: residual ~ 0
    proj = (samples - np.asarray(mean)) @ np.asarray(comps)
    recon = proj @ np.asarray(comps).T + np.asarray(mean)
    assert np.abs(recon - samples).max() < 1e-3


def test_pca_project_resize_shapes():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 9, 11, 8)).astype(np.float32)
    samples = feats.reshape(-1, 8)
    mean, comps = F.pca_fit(jnp.asarray(samples), k=4)
    out = F.pca_project_resize(
        jnp.asarray(feats), mean, comps, (18, 22)
    )
    assert out.shape == (2, 18, 22, 4)


def test_random_projection_extractor_deterministic():
    ext = F.RandomProjectionExtractor(feature_dim=32, seed=1)
    img = np.random.default_rng(0).uniform(size=(1, 56, 70, 3)).astype(np.float32)
    a, b = ext(img), ext(img)
    assert a.shape == (1, 4, 5, 32)
    assert np.allclose(a, b)


def test_drop_overlapping_horizons():
    from creste_public_tpu.preprocessing.splits import (
        drop_overlapping_horizons,
    )

    samples = [("0", 0), ("0", 3), ("0", 10), ("1", 2), ("1", 4), ("0", 25)]
    out = drop_overlapping_horizons(samples, horizon=10)
    # reference contract: kept rows come back (seq, frame)-sorted
    assert out == [("0", 0), ("0", 10), ("0", 25), ("1", 2)]
    # horizon 1 keeps everything (sorted)
    assert drop_overlapping_horizons(samples, 1) == sorted(
        samples, key=lambda s: (int(s[0]), s[1])
    )
