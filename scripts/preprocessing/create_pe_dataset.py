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
    ap.add_argument("--keep_raw", action="store_true",
                    help="keep the pass-1 raw feature maps on disk "
                         "(reference keeps GEN_FEATS output)")
    ap.add_argument("--workers", type=int, default=1,
                    help="thread-pool size for decode+extract and "
                         "project+save (the ViT/PCA device work releases "
                         "the GIL; reference: Pool(24), "
                         "create_pe_dataset.py:459,507)")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    import jax.numpy as jnp
    from PIL import Image

    from creste_public_tpu.preprocessing import features as F
    from creste_public_tpu.utils.concurrency import parallel_map

    ext = F.build_extractor(args.extractor, stride=args.stride)

    jobs = []
    for seq in args.seqs:
        for p in sorted(glob.glob(
            os.path.join(args.root, "2d_rect", args.cam, str(seq), "*.jpg")
        )):
            jobs.append((seq, p))

    # pass 1 (reference GEN_FEATS): extract, STREAM raw features to disk
    # (holding every dense pre-PCA map in RAM is hundreds of GB on real
    # sequences) and keep only a bounded per-frame PCA sample in memory
    per_frame = max(1, 100_000 // max(len(jobs), 1))

    def raw_path(seq, p):
        frame = os.path.splitext(os.path.basename(p))[0].split("_")[-1]
        d = os.path.join(args.root, "distillation_raw", args.cam, str(seq))
        return os.path.join(d, f"{frame}.npy"), frame

    def extract_one(job):
        seq, p = job
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        f = np.asarray(ext(img[None])[0], np.float32)
        rp, _ = raw_path(seq, p)
        os.makedirs(os.path.dirname(rp), exist_ok=True)
        np.save(rp, f)
        flat = f.reshape(-1, f.shape[-1])
        # stable digest, NOT hash(): str hashing is salted per interpreter
        # (PYTHONHASHSEED), which would make the PCA basis — and every
        # written feature map — irreproducible across runs
        import zlib

        rng = np.random.default_rng(zlib.crc32(f"{seq}/{p}".encode()))
        take = min(per_frame, len(flat))
        return flat[rng.choice(len(flat), take, replace=False)]

    samples = parallel_map(extract_one, jobs, workers=args.workers)
    mean, comps = F.pca_fit(
        jnp.asarray(np.concatenate(samples)), k=args.pca_dim
    )
    del samples

    # pass 2 (reference REDUCE_FEATS): read raw, project + resize + save
    def save_one(job):
        seq, p = job
        rp, frame = raw_path(seq, p)
        f = np.load(rp)
        out_dir = os.path.join(args.root, "distillation", args.cam, str(seq))
        os.makedirs(out_dir, exist_ok=True)
        proj = F.pca_project_resize(
            jnp.asarray(f[None]), mean, comps, tuple(args.out_hw)
        )
        np.save(os.path.join(out_dir, f"{frame}.npy"),
                np.asarray(proj[0], np.float32))
        if not args.keep_raw:
            os.remove(rp)

    parallel_map(save_one, jobs, workers=args.workers)
    print(f"wrote {len(jobs)} feature maps")


if __name__ == "__main__":
    main()
