"""CLI: dense depth label generation (reference: scripts/preprocessing/
build_dense_depth.py). One jitted accumulate+project kernel per frame.

Usage:
  python scripts/preprocessing/build_dense_depth.py --root data/creste \
      --seqs 0 1 --scans 5 --proc LAIDW
"""
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
    ap.add_argument("--scans", type=int, default=5)
    ap.add_argument("--proc", choices=["LA", "LAIDW"], default="LA")
    ap.add_argument("--cam", default="cam0")
    ap.add_argument("--out_root", default=None)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.data.calib import load_poses
    from creste_public_tpu.preprocessing.depth import build_sequence_depth

    for seq in args.seqs:
        poses = load_poses(args.root, seq)
        frames = range(len(poses))
        written = build_sequence_depth(
            args.root, seq, frames, scans=args.scans, proc=args.proc,
            cam=args.cam, out_root=args.out_root, workers=args.workers,
        )
        print(f"seq {seq}: wrote {len(written)} depth maps")


if __name__ == "__main__":
    main()
