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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--factor", type=int, default=4)
    args = ap.parse_args()

    from PIL import Image

    for p in glob.glob(os.path.join(args.in_dir, "**", "*.png"),
                       recursive=True):
        rel = os.path.relpath(p, args.in_dir)
        out = os.path.join(args.out_dir, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        img = np.asarray(Image.open(p))
        Image.fromarray(img[:: args.factor, :: args.factor]).save(out)
    print("done")


if __name__ == "__main__":
    main()
