"""CLI: split generation with curvature balancing (reference:
scripts/preprocessing/build_splits.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os


def classify_seq(job):
    """(root, seq, horizon, min_distance, curved_threshold) -> per-seq
    classification. Module-level: the Hausdorff curvature scan is pure
    NumPy (GIL-bound), so the pool runs in process mode (reference
    Pool(24))."""
    root, seq, horizon, min_distance, curved_threshold = job
    from creste_public_tpu.data.calib import load_poses
    from creste_public_tpu.preprocessing import splits as sp

    mats = load_poses(root, seq)
    return seq, sp.classify_curvature(
        mats, range(len(mats)), horizon, min_distance, curved_threshold
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--min_distance", type=float, default=3.0)
    ap.add_argument("--curved_threshold", type=float, default=0.5)
    ap.add_argument("--overlap", type=int, default=0,
                    help="if >0, thin samples whose horizon windows overlap "
                         "(reference build_splits.py:65)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--workers", type=int, default=1,
                    help="process-pool size over sequences")
    args = ap.parse_args()

    from creste_public_tpu.preprocessing import splits as sp
    from creste_public_tpu.utils.concurrency import parallel_map

    jobs = [(args.root, seq, args.horizon, args.min_distance,
             args.curved_threshold) for seq in args.seqs]
    results = parallel_map(classify_seq, jobs, workers=args.workers,
                           mode="process")
    samples, dists = [], {}
    for seq, (curved, straight, d) in results:
        samples += [(seq, f) for f in curved + straight]
        # key by (seq, frame): frame-only keys collide across sequences
        dists.update({(seq, f): v for f, v in d.items()})
    if args.overlap > 0:
        samples = sp.drop_overlapping_horizons(samples, args.overlap)
    parts = sp.train_val_test(samples)
    out = args.out or os.path.join(args.root, "splits")
    sp.write_split_files(out, parts, dists)
    print(f"wrote splits for {len(samples)} samples to {out}")


if __name__ == "__main__":
    main()
