"""BEV elevation label generation: grid binning + ground/overhang separation.

Parity targets: creste/utils/elevation_utils.py:211-303 (BinningPostprocess
min/max/var grid binning) and the gap-scan kernel in
scripts/preprocessing/build_feature_map.py:456-561 (`_compute_lower_and_
upper_elevation`): per cell, walk the ground-relative point elevations from
low to high; the first gap wider than ``gap_thres`` above
``min_overhang`` splits ground (lower elevation) from overhang/ceiling
(upper elevation); cells with no gap get upper = sky threshold. (The
reference kernel references two module-level constants that are undefined
in-tree; this implementation parameterises them: ``min_overhang`` and the
0.3 m first-point gate.)

TPU-first redesign: the reference's per-cell numba loop (sequential scan
over a ragged bin_group list) becomes one global lexsort by (cell, z) plus
segment-relative masks — every decision in the scan depends only on each
point's predecessor inside its segment, so the whole thing vectorises into
N-length elementwise ops + two scatter reductions. Fully jittable, static
shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

PROJ_GROUND, PROJ_CEILING, PROJ_SKY = 0, 1, 2


@partial(jax.jit, static_argnames=("n_cells",))
def bin_min_max_var(
    z: Array, cell: Array, valid: Array, n_cells: int
) -> tuple[Array, Array, Array, Array]:
    """Per-cell (min, max, variance, count) of point heights.

    z: [N] heights; cell: [N] linearised cell ids; valid: [N] bool.
    Empty cells: min/max are NaN, var 0.
    """
    idx = jnp.where(valid, cell, 0)
    inf = jnp.float32(jnp.inf)
    zmin = jnp.full((n_cells,), inf).at[idx].min(
        jnp.where(valid, z, inf), mode="drop"
    )
    zmax = jnp.full((n_cells,), -inf).at[idx].max(
        jnp.where(valid, z, -inf), mode="drop"
    )
    cnt = jnp.zeros((n_cells,)).at[idx].add(valid.astype(jnp.float32),
                                            mode="drop")
    s1 = jnp.zeros((n_cells,)).at[idx].add(jnp.where(valid, z, 0.0),
                                           mode="drop")
    s2 = jnp.zeros((n_cells,)).at[idx].add(jnp.where(valid, z * z, 0.0),
                                           mode="drop")
    mean = s1 / jnp.maximum(cnt, 1.0)
    var = jnp.maximum(s2 / jnp.maximum(cnt, 1.0) - mean * mean, 0.0)
    nan = jnp.float32(jnp.nan)
    zmin = jnp.where(cnt > 0, zmin, nan)
    zmax = jnp.where(cnt > 0, zmax, nan)
    return zmin, zmax, var, cnt


@partial(jax.jit, static_argnames=("n_cells",))
def lower_upper_elevation(
    z: Array,
    cell: Array,
    valid: Array,
    ground: Array,
    n_cells: int,
    sky_thres: float = 2.0,
    gap_thres: float = 0.1,
    min_overhang: float = 0.5,
    first_gate: float = 0.3,
) -> tuple[Array, Array, Array]:
    """Ground/overhang split per BEV cell.

    Args:
      z: [N] point heights; cell: [N] cell ids; valid: [N] point mask.
      ground: [n_cells] ground elevation estimate (NaN = skip cell).

    Returns:
      lower: [n_cells] top of the ground structure (NaN where undetermined).
      upper: [n_cells] bottom of the overhang, or sky_thres when none.
      proj_class: [N] per-point {GROUND, CEILING, SKY}.
    """
    N = z.shape[0]
    g = ground[jnp.clip(cell, 0, n_cells - 1)]
    e = z - g  # ground-relative elevation
    ok = valid & jnp.isfinite(g)
    # points below ground are skipped entirely; fold them into the e=0 start
    e_eff = jnp.where(ok, jnp.maximum(e, 0.0), jnp.inf)

    # global segment sort by (cell, elevation)
    order = jnp.lexsort((e_eff, jnp.where(ok, cell, n_cells)))
    se = e_eff[order]
    sc = jnp.where(ok, cell, n_cells)[order]
    pos = jnp.arange(N)
    seg_first = jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]]
    )
    prev = jnp.where(seg_first, 0.0, jnp.concatenate([se[:1] * 0, se[:-1]]))
    fin = jnp.isfinite(se)

    # cell break: the FIRST positive elevation in a cell exceeds first_gate
    is_first_pos = fin & (prev == 0.0) & (se > 0.0)
    breaks = is_first_pos & (se > first_gate)
    cell_broken = jnp.zeros((n_cells + 1,), bool).at[sc].max(
        breaks, mode="drop"
    )[:n_cells]

    # gap candidates (evaluated in the unbroken prefix semantics: a break can
    # only happen at the first positive point, so any later gap in a broken
    # cell is ignored via cell_broken)
    gap_here = fin & (se > min_overhang) & (se - prev > gap_thres) & ~breaks
    # first gap position per cell
    big = jnp.int32(N)
    gap_pos = jnp.where(gap_here, pos, big)
    first_gap = jnp.full((n_cells + 1,), big).at[sc].min(
        gap_pos, mode="drop"
    )[:n_cells]
    has_gap = (first_gap < big) & ~cell_broken

    # lower/upper from the gap point and its predecessor
    se_pad = jnp.concatenate([se, jnp.zeros((1,))])
    prev_pad = jnp.concatenate([prev, jnp.zeros((1,))])
    gp = jnp.clip(first_gap, 0, N)
    lower_gap = jnp.minimum(prev_pad[gp], sky_thres)
    upper_gap = jnp.minimum(se_pad[gp], sky_thres)

    # no-gap fallback: max finite elevation in the cell (0 if none positive)
    max_e = jnp.zeros((n_cells + 1,)).at[sc].max(
        jnp.where(fin, se, 0.0), mode="drop"
    )[:n_cells]
    nan = jnp.float32(jnp.nan)
    lower_nogap = jnp.where(
        (max_e > 0.0) & ~cell_broken, jnp.minimum(max_e, sky_thres), nan
    )

    lower = jnp.where(has_gap, lower_gap, lower_nogap)
    upper = jnp.where(has_gap, upper_gap, sky_thres)
    known = jnp.isfinite(ground)
    lower = jnp.where(known, lower, nan)
    upper = jnp.where(known, upper, nan)

    # per-point classes (in original point order)
    fg = first_gap[jnp.clip(sc, 0, n_cells - 1)]
    broken_pt = cell_broken[jnp.clip(sc, 0, n_cells - 1)]
    # the gap-discovery point itself is never classified by the reference
    # scan (it exits through the gap elif) and stays SKY — pinned by
    # tests/test_reference_exec_preproc.py
    cls_sorted = jnp.where(
        ~fin | broken_pt,
        PROJ_SKY,
        jnp.where(
            pos < fg,
            PROJ_GROUND,
            jnp.where((pos > fg) & (se < sky_thres), PROJ_CEILING, PROJ_SKY),
        ),
    )
    proj_class = jnp.zeros((N,), jnp.int32).at[order].set(cls_sorted)
    proj_class = jnp.where(ok, proj_class, PROJ_SKY)
    return lower, upper, proj_class


def elevation_maps_from_points(
    points: Array,
    grid_hw: tuple[int, int],
    map_range: float,
    sky_thres: float = 2.0,
    gap_thres: float = 0.1,
    min_overhang: float = 0.5,
) -> dict[str, Array]:
    """Full label pipeline: points [N, 3] (LiDAR frame) -> dict of [H, W]
    maps {elevation_min, elevation_max, variance, lower, upper}."""
    H, W = grid_hw
    voxel = 2 * map_range / H
    # BEV cell: same convention as geometry.lidar_to_map (x fwd -> row)
    col = jnp.floor((points[:, 1] + map_range) / voxel).astype(jnp.int32)
    row = jnp.floor((points[:, 0] + map_range) / voxel).astype(jnp.int32)
    valid = (row >= 0) & (row < H) & (col >= 0) & (col < W)
    cell = jnp.where(valid, row * W + col, 0)
    z = points[:, 2]
    zmin, zmax, var, _ = bin_min_max_var(z, cell, valid, H * W)
    lower, upper, _ = lower_upper_elevation(
        z, cell, valid, zmin, H * W, sky_thres, gap_thres, min_overhang
    )
    return {
        "elevation_min": zmin.reshape(H, W),
        "elevation_max": zmax.reshape(H, W),
        "variance": var.reshape(H, W),
        "lower": lower.reshape(H, W),
        "upper": upper.reshape(H, W),
    }
