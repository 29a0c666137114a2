"""CLI: valid expert-demo start frames (reference: scripts/preprocessing/
create_traversability_dataset.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os

import numpy as np


def starts_one(job):
    """(root, seq, num_frames, dist_thresh) -> writes traversability/{seq}.txt.
    Module-level for the process pool (pure-NumPy pose filtering)."""
    root, seq, num_frames, dist_thresh = job
    from creste_public_tpu.preprocessing.splits import traversability_starts

    rows = np.loadtxt(
        os.path.join(root, "poses", "dense", f"{seq}.txt")
    ).reshape(-1, 8)
    starts = traversability_starts(rows, num_frames, dist_thresh=dist_thresh)
    out_dir = os.path.join(root, "traversability")
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, f"{seq}.txt"), starts, fmt="%d")
    return seq, len(starts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--num_frames", type=int, default=50)
    ap.add_argument("--dist_thresh", type=float, default=2.0)
    ap.add_argument("--workers", type=int, default=1,
                    help="process-pool size over sequences")
    args = ap.parse_args()

    from creste_public_tpu.utils.concurrency import parallel_map

    jobs = [(args.root, seq, args.num_frames, args.dist_thresh)
            for seq in args.seqs]
    for seq, n in parallel_map(starts_one, jobs, workers=args.workers,
                               mode="process"):
        print(f"seq {seq}: {n} valid starts")


if __name__ == "__main__":
    main()
