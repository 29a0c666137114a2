"""BEV SAM instance-map construction (static + dynamic labels).

Parity targets: scripts/preprocessing/build_sam_map.py —
  * static path (:906, loop 736-783): per-frame image instance labels are
    lifted to the BEV grid through the depth horizon, then merged across
    the temporal horizon by greedy label-overlap mapping
    (`compute_label_mapping`:158, `merge_maps`:233): each new-frame label
    adopts the accumulated label it overlaps most, otherwise gets a fresh
    id.
  * dynamic path (:635, `cluster_xyz_labels`:413-588): ground-plane removal,
    multi-eps DBSCAN ensemble over the LiDAR points (reference: cuml on
    GPU -> sklearn here; same algorithm), clusters matched to image
    instances by majority projected label -> 3-channel map
    (instance, class, occupancy).

Host-side NumPy/sklearn: this is offline label generation; the per-cell
majority scatter is the only hot op and is vectorised.
"""
from __future__ import annotations

import numpy as np

Array = np.ndarray


def bev_cell_ids(
    points: Array, grid: int, map_range: float
) -> tuple[Array, Array]:
    """LiDAR xy -> linearised BEV cell ids + in-range mask."""
    voxel = 2 * map_range / grid
    row = np.floor((points[:, 0] + map_range) / voxel).astype(np.int64)
    col = np.floor((points[:, 1] + map_range) / voxel).astype(np.int64)
    ok = (row >= 0) & (row < grid) & (col >= 0) & (col < grid)
    return row * grid + col, ok


def majority_label_map(
    points: Array, labels: Array, grid: int, map_range: float,
    ignore: int = 0,
) -> Array:
    """[N,3] points + [N] int labels -> [grid, grid] majority-vote label map
    (0 = empty/ignore)."""
    cell, ok = bev_cell_ids(points, grid, map_range)
    ok = ok & (labels != ignore)
    if not ok.any():
        return np.zeros((grid, grid), np.int32)
    cell, labels = cell[ok], labels[ok]
    # majority by counting (cell, label) pairs
    key = cell * (labels.max() + 1) + labels
    uniq, counts = np.unique(key, return_counts=True)
    u_cell = uniq // (labels.max() + 1)
    u_label = uniq % (labels.max() + 1)
    # later writes win: ascending count, and within equal counts descending
    # label so the SMALLEST label lands last — the reference's argmax
    # tie-break (utils.py:105-123), pinned by the reference-exec golden
    order = np.lexsort((-u_label, counts))
    out = np.zeros((grid * grid,), np.int32)
    out[u_cell[order]] = u_label[order]
    return out.reshape(grid, grid)


def label_overlap_mapping(
    anchor: Array, new: Array, ignore: int = 0
) -> dict[int, int]:
    """For each label in ``new``, the anchor label it overlaps most
    (build_sam_map.py:158-204). Labels with zero overlap are absent."""
    mask = (anchor != ignore) & (new != ignore)
    if not mask.any():
        return {}
    pairs = np.stack([new[mask], anchor[mask]], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    mapping: dict[int, int] = {}
    best: dict[int, int] = {}
    for (nl, al), c in zip(uniq, counts):
        if c > best.get(int(nl), 0):
            best[int(nl)] = int(c)
            mapping[int(nl)] = int(al)
    return mapping


def merge_instance_maps(
    anchor: Array, new: Array, next_label: int, ignore: int = 0
) -> tuple[Array, int]:
    """Merge ``new`` into ``anchor``: overlapping labels adopt the anchor
    id, novel labels get fresh ids from ``next_label`` upward; anchor
    pixels win on conflict (build_sam_map.py:233-310 semantics)."""
    mapping = label_overlap_mapping(anchor, new, ignore)
    out = anchor.copy()
    remapped = np.zeros_like(new)
    for label in np.unique(new):
        if label == ignore:
            continue
        if int(label) in mapping:
            remapped[new == label] = mapping[int(label)]
        else:
            remapped[new == label] = next_label
            next_label += 1
    fill = (out == ignore) & (remapped != ignore)
    out[fill] = remapped[fill]
    return out, next_label


def accumulate_instance_maps(maps: list[Array], ignore: int = 0) -> Array:
    """Temporal greedy merge over a frame horizon (loop at
    build_sam_map.py:736-783)."""
    if not maps:
        raise ValueError("no maps")
    out = maps[0].astype(np.int32).copy()
    next_label = int(out.max()) + 1
    for m in maps[1:]:
        out, next_label = merge_instance_maps(
            out, m.astype(np.int32), next_label, ignore
        )
    return out


def make_labels_contiguous(label_map: Array, ignore: int = 0) -> Array:
    """Compact label ids to 0..K (reference utils.make_labels_contiguous_
    vectorized); ignore stays 0."""
    uniq = np.unique(label_map)
    uniq = uniq[uniq != ignore]
    out = np.zeros_like(label_map)
    for new, old in enumerate(uniq, start=1):
        out[label_map == old] = new
    return out


def backproject_depth_image(depth_m: Array, p2p: Array) -> Array:
    """Dense depth image -> LiDAR-frame points (Camera2World semantics,
    splat_projection.py:12-51, NumPy host-side).

    depth_m: [H, W] metres; p2p: [4, 4]. Returns [H, W, 3].
    """
    H, W = depth_m.shape
    v, u = np.mgrid[0:H, 0:W].astype(np.float64)
    d = depth_m.astype(np.float64)
    pix = np.stack([u * d, v * d, d, np.ones_like(d)], axis=-1)
    xyz = np.einsum("ij,hwj->hwi", p2p.astype(np.float64), pix)
    return xyz[..., :3]


def static_bev_map(
    sam_img: Array,
    depth_m: Array,
    p2p: Array,
    grid: int,
    map_range: float,
    height_range: tuple[float, float] = (-1.5, 1.0),
    depth_range: tuple[float, float] = (0.0, 12.8),
    static_mask: Array | None = None,
) -> Array:
    """One frame's per-pixel SAM instances lifted to the BEV grid through
    the depth horizon (compute_sam_map_single, build_sam_map.py:720-760).

    Args:
      sam_img: [H, W] per-pixel instance ids (0 = unlabeled).
      depth_m: [H, W] dense metric depth (metres) at the same resolution.
      p2p: [4, 4] pixel->anchor-LiDAR transform (pose-chained for horizon
        frames: inv(pose_anchor) @ pose_frame @ p2p_frame).
      static_mask: optional [H, W] bool — True where the pixel is static
        (the reference's mv_mask = dynamic_label == 0, :742).

    Returns [grid, grid] contiguous instance labels (0 = empty).
    """
    xyz = backproject_depth_image(depth_m, p2p).reshape(-1, 3)
    labels = sam_img.reshape(-1).astype(np.int64)
    mask = (
        (depth_m.reshape(-1) > depth_range[0])
        & (depth_m.reshape(-1) < depth_range[1])
        & (xyz[:, 2] > height_range[0])
        & (xyz[:, 2] < height_range[1])
    )
    if static_mask is not None:
        mask &= static_mask.reshape(-1)
    m = majority_label_map(xyz[mask], labels[mask], grid, map_range)
    return make_labels_contiguous(m)


def static_bev_map_horizon(
    frames: list[tuple[Array, Array, Array]],
    grid: int,
    map_range: float,
    static_masks: list[Array] | None = None,
    **kwargs,
) -> Array:
    """Depth-horizon static SAM map: per-frame BEV lifts greedily merged,
    anchor (frames[0]) first (the loop at build_sam_map.py:736-783).

    frames: [(sam_img, depth_m, p2p_into_anchor), ...] with the anchor at
    index 0 (the reference reorders horizon_ids anchor-first, :734-736).
    """
    maps = []
    for i, (sam_img, depth_m, p2p) in enumerate(frames):
        sm = static_masks[i] if static_masks is not None else None
        maps.append(static_bev_map(sam_img, depth_m, p2p, grid, map_range,
                                   static_mask=sm, **kwargs))
    return accumulate_instance_maps(maps)


def remove_ground_plane(
    points: Array, z_threshold: float = 0.15, iterations: int = 50,
    seed: int = 0,
) -> Array:
    """RANSAC plane removal (open3d equivalent, build_sam_map.py:330):
    returns a boolean mask of NON-ground points."""
    rng = np.random.default_rng(seed)
    n = len(points)
    if n < 10:
        return np.ones((n,), bool)
    best_inliers = np.zeros((n,), bool)
    for _ in range(iterations):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = points[idx, :3]
        normal = np.cross(p1 - p0, p2 - p0)
        nn = np.linalg.norm(normal)
        if nn < 1e-9:
            continue
        normal = normal / nn
        if abs(normal[2]) < 0.8:  # require near-horizontal plane
            continue
        dist = np.abs((points[:, :3] - p0) @ normal)
        inliers = dist < z_threshold
        if inliers.sum() > best_inliers.sum():
            best_inliers = inliers
    return ~best_inliers


def dbscan_ensemble(
    points: Array, eps_list=(0.1, 0.2, 0.3), min_samples: int = 5
) -> Array:
    """Multi-eps DBSCAN ensemble (build_sam_map.py:413-588, cuml -> sklearn):
    clusters from the finest eps, points noise at a finer eps adopt the
    label of the next coarser clustering (offset to stay unique).
    Returns [N] cluster ids, 0 = noise."""
    from sklearn.cluster import DBSCAN

    n = len(points)
    out = np.zeros((n,), np.int64)
    offset = 1
    unassigned = np.ones((n,), bool)
    for eps in eps_list:
        if not unassigned.any():
            break
        sub = np.nonzero(unassigned)[0]
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(
            points[sub, :3]
        )
        got = labels >= 0
        out[sub[got]] = labels[got] + offset
        if got.any():
            offset = int(out.max()) + 1
        unassigned[sub[got]] = False
    return out


def match_clusters_to_instances(
    cluster_ids: Array, point_instance: Array, ignore: int = 0
) -> Array:
    """Assign each 3-D cluster the image-instance id its points vote for
    (IoU-majority matching, build_sam_map.py:413-588)."""
    out = np.zeros_like(point_instance)
    for cid in np.unique(cluster_ids):
        if cid == 0:
            continue
        members = cluster_ids == cid
        votes = point_instance[members]
        votes = votes[votes != ignore]
        if len(votes) == 0:
            continue
        vals, counts = np.unique(votes, return_counts=True)
        out[members] = vals[np.argmax(counts)]
    return out


def dynamic_sam_map(
    points: Array,
    point_instance: Array,
    point_class: Array,
    grid: int,
    map_range: float,
    eps_list=(0.1, 0.2, 0.3),
) -> Array:
    """Full dynamic-label pipeline -> [grid, grid, 3]
    (instance, class, occupancy) (build_sam_map.py:635-712)."""
    keep = remove_ground_plane(points)
    pts = points[keep]
    inst = point_instance[keep]
    cls = point_class[keep]
    clusters = dbscan_ensemble(pts, eps_list)
    inst_clean = match_clusters_to_instances(clusters, inst)
    inst_map = majority_label_map(pts, inst_clean, grid, map_range)
    cls_map = majority_label_map(pts, cls, grid, map_range)
    occ = (inst_map > 0).astype(np.int32)
    return np.stack([inst_map, cls_map, occ], axis=-1)
