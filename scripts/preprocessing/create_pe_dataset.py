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
    ap.add_argument("--workers", type=int, default=1,
                    help="thread-pool size for decode+extract and "
                         "project+save (the ViT/PCA device work releases "
                         "the GIL; reference: Pool(24), "
                         "create_pe_dataset.py:459,507)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from creste_public_tpu.preprocessing import features as F
    from creste_public_tpu.utils.concurrency import parallel_map

    ext = F.build_extractor(args.extractor, stride=args.stride)

    def extract_one(job):
        seq, p = job
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        return seq, p, ext(img[None])[0]

    # pass 1: extract + sample for PCA (order-preserving parallel map keeps
    # the PCA sample deterministic)
    jobs = []
    for seq in args.seqs:
        for p in sorted(glob.glob(
            os.path.join(args.root, "2d_rect", args.cam, str(seq), "*.jpg")
        )):
            jobs.append((seq, p))
    frames = parallel_map(extract_one, jobs, workers=args.workers)
    samples = F.sample_features([f for _, _, f in frames])
    mean, comps = F.pca_fit(jnp.asarray(samples), k=args.pca_dim)

    # pass 2: project + resize + save
    def save_one(job):
        seq, p, f = job
        out_dir = os.path.join(args.root, "distillation", args.cam, str(seq))
        os.makedirs(out_dir, exist_ok=True)
        frame = os.path.splitext(os.path.basename(p))[0].split("_")[-1]
        proj = F.pca_project_resize(
            jnp.asarray(f[None]), mean, comps, tuple(args.out_hw)
        )
        np.save(os.path.join(out_dir, f"{frame}.npy"),
                np.asarray(proj[0], np.float32))

    parallel_map(save_one, frames, workers=args.workers)
    print(f"wrote {len(frames)} feature maps")


if __name__ == "__main__":
    main()
