"""CLI: DINOv2 distillation feature labels (reference: scripts/
preprocessing/create_pe_dataset.py). Extractor -> jitted PCA -> .npy."""
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
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--cam", default="cam0")
    ap.add_argument("--pca_dim", type=int, default=128)
    ap.add_argument("--out_hw", type=int, nargs=2, default=[128, 153])
    ap.add_argument("--extractor", default="auto")
    ap.add_argument("--stride", type=int, default=7,
                    help="dense ViT extraction stride (reference stride-7 "
                         "PE interpolation, feature_extractor.py:236)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from creste_public_tpu.preprocessing import features as F

    ext = F.build_extractor(args.extractor, stride=args.stride)
    # pass 1: extract + sample for PCA
    all_feats, frames = [], []
    for seq in args.seqs:
        paths = sorted(glob.glob(
            os.path.join(args.root, "2d_rect", args.cam, str(seq), "*.jpg")
        ))
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            f = ext(img[None])[0]
            all_feats.append(f)
            frames.append((seq, p, f))
    samples = F.sample_features([f for f in all_feats])
    mean, comps = F.pca_fit(jnp.asarray(samples), k=args.pca_dim)

    # pass 2: project + resize + save
    for seq, p, f in frames:
        out_dir = os.path.join(args.root, "distillation", args.cam, str(seq))
        os.makedirs(out_dir, exist_ok=True)
        frame = os.path.splitext(os.path.basename(p))[0].split("_")[-1]
        proj = F.pca_project_resize(
            jnp.asarray(f[None]), mean, comps, tuple(args.out_hw)
        )
        np.save(os.path.join(out_dir, f"{frame}.npy"),
                np.asarray(proj[0], np.float32))
    print(f"wrote {len(frames)} feature maps")


if __name__ == "__main__":
    main()
