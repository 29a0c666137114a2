"""CLI: BEV elevation labels via jitted grid binning + gap-scan
(reference: scripts/preprocessing/build_feature_map.py)."""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--map_range", type=float, default=12.8)
    ap.add_argument("--scans", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from creste_public_tpu.data.calib import load_poses
    from creste_public_tpu.ops.depth_projection import accumulate_scans
    from creste_public_tpu.ops.elevation import elevation_maps_from_points
    from creste_public_tpu.preprocessing.depth import load_scan

    for seq in args.seqs:
        poses = load_poses(args.root, seq)
        out_dir = os.path.join(args.root, "elevation", str(seq))
        os.makedirs(out_dir, exist_ok=True)
        half = args.scans // 2
        for frame in range(len(poses)):
            out = os.path.join(out_dir, f"{frame}.npy")
            if os.path.exists(out):
                continue
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
        print(f"seq {seq}: elevation labels at {out_dir}")


if __name__ == "__main__":
    main()
