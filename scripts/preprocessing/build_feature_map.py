"""CLI: BEV geometric + semantic labels from accumulated LiDAR.

Reference: scripts/preprocessing/build_feature_map.py — tasks:
  elevation : jitted grid binning + gap-scan lower/upper elevation
              (ops/elevation.py; reference BinningPostprocess + numba kernel)
  3d_ssc    : per-voxel semantic class-count bins (SemanticMap,
              reference :55-345), int64 [grid, grid, 25]
  3d_soc    : per-voxel object class-count bins, uint16 [grid, grid, 60]

Per-point labels come from `{label_dir}/{seq}/{frame}.bin` (uint32 ids,
--label_source points) or are lifted from per-pixel `{frame}.npy` images
through the calibrated projection (--label_source image).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os

import numpy as np


def build_elevation(args, seq):
    """Reference-shipped path (default): window-accumulated labelled map
    -> Map2D robust-min + kernel maps, `.bin` f32 (process_single_frame
    ELEVATION branch, reference build_feature_map.py:770-780). The
    `gapscan` mode keeps the repo's jitted lower/upper gap-scan kernel
    (the reference's compute_lower_and_upper_elevation, dead code in its
    save path) writing `.npy`."""
    if args.elevation_mode == "reference":
        from creste_public_tpu.preprocessing.semantic_map import (
            build_elevation_bins,
        )

        n = build_elevation_bins(
            args.root, seq, args.sem_label_dir,
            out_dir=os.path.join(args.root, "elevation"),
            var_dir=os.path.join(args.root, "variance"),
            grid=args.grid, map_range=args.map_range, window=args.window,
            label_source=args.label_source, workers=args.workers,
        )
        print(f"seq {seq}: {n} elevation labels at "
              f"{os.path.join(args.root, 'elevation')}")
        return

    import jax.numpy as jnp

    from creste_public_tpu.data.calib import load_poses
    from creste_public_tpu.ops.depth_projection import accumulate_scans
    from creste_public_tpu.ops.elevation import elevation_maps_from_points
    from creste_public_tpu.preprocessing.depth import load_scan

    poses = load_poses(args.root, seq)
    out_dir = os.path.join(args.root, "elevation", str(seq))
    os.makedirs(out_dir, exist_ok=True)
    half = args.scans // 2

    def one(frame):
        out = os.path.join(out_dir, f"{frame}.npy")
        if os.path.exists(out):
            return
        ids = np.clip(np.arange(frame - half, frame - half + args.scans),
                      0, len(poses) - 1)
        scans = [load_scan(args.root, seq, int(i)) for i in ids]
        n = min(len(s) for s in scans)
        merged = accumulate_scans(
            jnp.asarray(np.stack([s[:n] for s in scans])),
            jnp.asarray(poses[ids]), jnp.asarray(poses[frame]),
        )
        maps = elevation_maps_from_points(
            merged, (args.grid, args.grid), args.map_range
        )
        label = np.stack(
            [np.asarray(maps["lower"]), np.asarray(maps["upper"])], -1
        )
        np.save(out, label.astype(np.float32))

    from creste_public_tpu.utils.concurrency import parallel_map

    parallel_map(one, range(len(poses)), args.workers)
    print(f"seq {seq}: elevation labels at {out_dir}")


def build_ssc(args, seq, task):
    from creste_public_tpu.preprocessing.semantic_map import build_count_bins

    if task == "3d_ssc":
        label_dir, num_classes, dtype = args.sem_label_dir, 25, "int64"
    else:
        label_dir, num_classes, dtype = args.obj_label_dir, 60, "uint16"
    n = build_count_bins(
        args.root, seq, label_dir,
        out_dir=os.path.join(args.root, task),
        grid=args.grid, map_range=args.map_range,
        num_classes=num_classes, out_dtype=dtype,
        window=args.window, label_source=args.label_source,
        workers=args.workers,
    )
    print(f"seq {seq}: {n} {task} scenes at {os.path.join(args.root, task)}")


def build_fsc(args, seq):
    from creste_public_tpu.preprocessing.semantic_map import (
        build_descriptor_bins,
    )

    n = build_descriptor_bins(
        args.root, seq, args.feat_dir,
        out_dir=os.path.join(args.root, "3d_fsc"),
        grid=args.grid, map_range=args.map_range, window=args.window,
        ds=args.ds, aggregator=args.aggregator, workers=args.workers,
    )
    print(f"seq {seq}: {n} 3d_fsc scenes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--tasks", nargs="+", default=["elevation"],
                    choices=["elevation", "3d_ssc", "3d_soc", "3d_fsc"])
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--map_range", type=float, default=12.8)
    ap.add_argument("--scans", type=int, default=10,
                    help="elevation accumulation horizon (gapscan mode)")
    ap.add_argument("--elevation_mode", default="reference",
                    choices=["reference", "gapscan"],
                    help="reference: shipped Map2D pipeline -> .bin; "
                         "gapscan: lower/upper gap-scan kernel -> .npy")
    ap.add_argument("--window", type=int, default=50,
                    help="semantic-map lookback (reference WINDOW_SIZE)")
    ap.add_argument("--sem_label_dir", default="3d_semantic")
    ap.add_argument("--obj_label_dir", default="3d_objects")
    ap.add_argument("--label_source", default="points",
                    choices=["points", "image"])
    ap.add_argument("--feat_dir", default="distillation/cam0",
                    help="3d_fsc: per-frame feature maps (create_pe_dataset)")
    ap.add_argument("--ds", type=int, default=4,
                    help="3d_fsc: feature-map downsample vs camera res")
    ap.add_argument("--aggregator", default="GMP", choices=["GMP", "GAP"])
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    for seq in args.seqs:
        for task in args.tasks:
            if task == "elevation":
                build_elevation(args, seq)
            elif task == "3d_fsc":
                build_fsc(args, seq)
            else:
                build_ssc(args, seq, task)


if __name__ == "__main__":
    main()
