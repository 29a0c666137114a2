"""CLI: BEV SAM instance maps, static + dynamic (reference:
scripts/preprocessing/build_sam_map.py)."""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--mode", choices=["static", "dynamic"], default="static")
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--map_range", type=float, default=12.8)
    ap.add_argument("--horizon", type=int, default=5)
    args = ap.parse_args()

    from creste_public_tpu.preprocessing import sam_map as sm
    from creste_public_tpu.preprocessing.depth import load_scan
    from creste_public_tpu.data.calib import load_poses

    for seq in args.seqs:
        poses = load_poses(args.root, seq)
        label_dir = "3d_sam" if args.mode == "static" else "3d_sam_dynamic"
        img_label_dir = os.path.join(args.root, f"{label_dir}_image", str(seq))
        out_dir = os.path.join(args.root, label_dir, str(seq))
        os.makedirs(out_dir, exist_ok=True)
        for frame in range(len(poses)):
            out = os.path.join(out_dir, f"{frame}.npy")
            if os.path.exists(out):
                continue
            # per-point image-instance labels precomputed by
            # create_sam_dataset (pluggable FM stage)
            pl_path = os.path.join(img_label_dir, f"{frame}.npy")
            if not os.path.exists(pl_path):
                continue
            pl = np.load(pl_path)  # [N, 2] (instance, class) per point
            pts = load_scan(args.root, seq, frame)
            n = min(len(pts), len(pl))
            if args.mode == "dynamic":
                label = sm.dynamic_sam_map(
                    pts[:n], pl[:n, 0].astype(np.int64),
                    pl[:n, 1].astype(np.int64),
                    args.grid, args.map_range,
                )
            else:
                maps = [sm.majority_label_map(
                    pts[:n], pl[:n, 0].astype(np.int64),
                    args.grid, args.map_range)]
                label = sm.accumulate_instance_maps(maps)
            np.save(out, label.astype(np.uint16))
        print(f"seq {seq}: SAM maps at {out_dir}")


if __name__ == "__main__":
    main()
