"""Loader throughput benchmark: on-disk CODa-layout decode -> batches/s.

VERDICT round-1 item #6: show the input pipeline sustains >= the TPU step
rate at batch 16. Writes a synthetic full-resolution CODa tree (real JPEG +
16-bit PNG files), then measures EpochLoader samples/s at several worker
counts (the GIL-free native decode path when built, PIL otherwise).

Usage: python scripts/benchmarks/loader_bench.py [--frames 64] [--batch 16]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import os
import shutil
import tempfile
import time

import numpy as np


def write_tree(root: str, frames: int, hw=(512, 612)) -> None:
    import yaml
    from PIL import Image

    from creste_public_tpu.data import coda_constants as cc

    H, W = hw
    seq = "0"
    os.makedirs(os.path.join(root, cc.SPLITS_DIR), exist_ok=True)
    with open(os.path.join(root, cc.SPLITS_DIR, "train.txt"), "w") as f:
        f.writelines(f"0 {i}\n" for i in range(frames))
    cal = os.path.join(root, cc.CALIBRATION_DIR, seq)
    os.makedirs(cal, exist_ok=True)
    P = [72.0, 0, W / 2, 0, 0, 72.0, H / 2, 0, 0, 0, 1, 0]
    with open(os.path.join(cal, "calib_cam0_intrinsics.yaml"), "w") as f:
        yaml.safe_dump({
            "camera_matrix": {"rows": 3, "cols": 3,
                              "data": [72.0, 0, W / 2, 0, 72.0, H / 2,
                                       0, 0, 1]},
            "rectification_matrix": {"rows": 3, "cols": 3,
                                     "data": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
            "projection_matrix": {"rows": 3, "cols": 4, "data": P},
            "image_height": H, "image_width": W}, f)
    with open(os.path.join(cal, "calib_os1_to_cam0.yaml"), "w") as f:
        yaml.safe_dump({
            "extrinsic_matrix": {"rows": 3, "cols": 4,
                                 "data": [0, -1, 0, 0, 0, 0, -1, 0,
                                          1, 0, 0, 0]},
            "projection_matrix": {"rows": 3, "cols": 4, "data": P}}, f)
    poses = os.path.join(root, cc.POSES_DIR, "dense")
    os.makedirs(poses, exist_ok=True)
    np.savetxt(os.path.join(poses, f"{seq}.txt"), np.asarray(
        [[i * 0.1, i * 0.2, 0, 0, 1, 0, 0, 0] for i in range(frames)]))

    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, cc.CAMERA_DIR, "cam0", seq)
    dep_dir = os.path.join(root, "depth_5_LA_all", "cam0", seq)
    fimg_dir = os.path.join(root, cc.DISTILLATION_LABEL_DIR, "cam0", seq)
    for d in (img_dir, dep_dir, fimg_dir):
        os.makedirs(d, exist_ok=True)
    for fr in range(frames):
        Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(os.path.join(
            img_dir, cc.frame_filename(cc.CAMERA_DIR, "cam0", seq, fr, "jpg")))
        Image.fromarray(
            rng.integers(300, 20000, (H, W)).astype(np.uint16)
        ).save(os.path.join(dep_dir, f"{fr}.png"))
        np.save(os.path.join(fimg_dir, f"{fr}.npy"),
                rng.normal(size=(H // 4, W // 4, 128)).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--mode", default="thread",
                    choices=["thread", "process"],
                    help="EpochLoader worker_mode (process = persistent spawn pool\n                    for GIL-bound sample assembly)")
    ap.add_argument("--root", default=None,
                    help="existing CODa tree (default: synthesize one)")
    args = ap.parse_args()

    from creste_public_tpu.data import native_io
    from creste_public_tpu.data.coda_dataset import CodaDataset
    from creste_public_tpu.data.dataloader import EpochLoader

    tmp = None
    root = args.root
    if root is None:
        tmp = tempfile.mkdtemp(prefix="loaderbench_")
        print(f"writing {args.frames}-frame synthetic tree to {tmp} ...")
        write_tree(tmp, args.frames)
        root = tmp

    print(f"native decode: {native_io.available()}")
    try:
        ds = CodaDataset({"root": root, "views": 1, "ds": 4, "grid": 256,
                          "map_range": 12.8, "horizon": 10})
        for w in args.workers:
            loader = EpochLoader(ds, args.batch, shuffle=False,
                                 num_workers=w, prefetch=2,
                                 worker_mode=args.mode)
            n = 0
            t0 = time.perf_counter()
            for batch in loader.epoch(0):
                n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(f"workers={w:3d} [{args.mode}]: {n / dt:8.1f} samples/s "
                  f"({n} samples in {dt:.2f}s)")
            loader.close()
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
