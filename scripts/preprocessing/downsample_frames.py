"""CLI: 4x-downsampled depth copies for GT supervision (reference:
scripts/preprocessing/downsample_frames.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import glob
import os

import numpy as np


def downsample_one(job: tuple[str, str, int]) -> None:
    """(src, dst, factor) — module-level so the process pool can pickle it
    (the PIL decode/encode body is GIL-bound; reference uses Pool)."""
    from PIL import Image

    src, dst, factor = job
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    img = np.asarray(Image.open(src))
    Image.fromarray(img[::factor, ::factor]).save(dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--workers", type=int, default=1,
                    help="process-pool size (reference Pool(24))")
    args = ap.parse_args()

    from creste_public_tpu.utils.concurrency import parallel_map

    jobs = []
    for p in glob.glob(os.path.join(args.in_dir, "**", "*.png"),
                       recursive=True):
        rel = os.path.relpath(p, args.in_dir)
        jobs.append((p, os.path.join(args.out_dir, rel), args.factor))
    parallel_map(downsample_one, jobs, workers=args.workers, mode="process")
    print(f"done ({len(jobs)} frames)")


if __name__ == "__main__":
    main()
