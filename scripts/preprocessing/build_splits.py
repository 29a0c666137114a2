"""CLI: split generation with curvature balancing (reference:
scripts/preprocessing/build_splits.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--min_distance", type=float, default=3.0)
    ap.add_argument("--curved_threshold", type=float, default=0.5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from creste_public_tpu.data.calib import load_poses
    from creste_public_tpu.preprocessing import splits as sp

    samples, dists = [], {}
    for seq in args.seqs:
        mats = load_poses(args.root, seq)
        curved, straight, d = sp.classify_curvature(
            mats, range(len(mats)), args.horizon, args.min_distance,
            args.curved_threshold,
        )
        samples += [(seq, f) for f in curved + straight]
        dists.update({f: v for f, v in d.items()})
    parts = sp.train_val_test(samples)
    out = args.out or os.path.join(args.root, "splits")
    sp.write_split_files(out, parts, dists)
    print(f"wrote splits for {len(samples)} samples to {out}")


if __name__ == "__main__":
    main()
