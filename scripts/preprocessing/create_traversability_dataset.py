"""CLI: valid expert-demo start frames (reference: scripts/preprocessing/
create_traversability_dataset.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--num_frames", type=int, default=50)
    ap.add_argument("--dist_thresh", type=float, default=2.0)
    args = ap.parse_args()

    from creste_public_tpu.preprocessing.splits import traversability_starts

    out_dir = os.path.join(args.root, "traversability")
    os.makedirs(out_dir, exist_ok=True)
    for seq in args.seqs:
        rows = np.loadtxt(
            os.path.join(args.root, "poses", "dense", f"{seq}.txt")
        ).reshape(-1, 8)
        starts = traversability_starts(
            rows, args.num_frames, dist_thresh=args.dist_thresh
        )
        np.savetxt(os.path.join(out_dir, f"{seq}.txt"), starts, fmt="%d")
        print(f"seq {seq}: {len(starts)} valid starts")


if __name__ == "__main__":
    main()
