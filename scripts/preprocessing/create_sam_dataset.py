"""CLI: image-space SAM instance labels (reference: scripts/preprocessing/
create_sam_dataset.py).

static mode (:195,451-497): automatic mask generation (HF
`facebook/sam-vit-huge` mask-generation pipeline) -> argmax-confidence
instance map per frame -> 2d_sam/{cam}/{seq}/{frame}.npy [H, W] uint16.

dynamic mode (:312-448): GroundingDINO box prompts + SAM mask prediction +
video propagation with an IoU-tracked instance registry
(sam2_utils/mask_dictionary_model.py), implemented behind pluggable
interfaces (preprocessing/video_tracking.py). When FM weights are absent
(zero-egress) the deterministic fakes run the SAME tracking algorithm over
threshold blobs, keeping the downstream BEV pipeline runnable and the ids
temporally consistent -> 2d_sam_dynamic/{cam}/{seq}/{frame}.npy
[H, W, 2] uint16 (instance, class).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import glob
import os

import numpy as np


def build_mask_generator():
    """Real SAM automatic mask generation when weights resolve (hub cache
    or a local HF checkpoint dir via CRESTE_SAM_MODEL), else None. Uses
    the in-tree point-grid generator — the HF "mask-generation" pipeline
    postprocess needs torchvision (absent in this image)."""
    from creste_public_tpu.preprocessing.video_tracking import (
        try_load_auto_mask_generator,
    )

    return try_load_auto_mask_generator()


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


def placeholder_instances(img, seed=0):
    """Seeded superpixel-ish grid labels (static fallback without weights)."""
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


def frame_paths(root, cam, seq):
    paths = sorted(glob.glob(os.path.join(
        root, "2d_rect", cam, str(seq), "*.jpg")))

    def frame_of(p):
        return int(os.path.splitext(os.path.basename(p))[0].split("_")[-1])

    return sorted(paths, key=frame_of), [frame_of(p) for p in sorted(
        paths, key=frame_of)]


def run_static(args, seq):
    from PIL import Image

    gen = build_mask_generator()
    if gen is None:
        print("WARNING: SAM weights unavailable; writing placeholder labels")
    out_dir = os.path.join(args.root, "2d_sam", args.cam, str(seq))
    os.makedirs(out_dir, exist_ok=True)
    paths, frames = frame_paths(args.root, args.cam, seq)
    for p, frame in zip(paths, frames):
        out = os.path.join(out_dir, f"{frame}.npy")
        if os.path.exists(out):
            continue
        img = np.asarray(Image.open(p).convert("RGB"))
        if gen is not None:
            masks, scores = gen.generate(img)
            inst = masks_to_instance_map(
                list(masks), list(scores), img.shape[:2],
            )
        else:
            inst = placeholder_instances(img, seed=frame)
        np.save(out, inst)
    print(f"seq {seq}: {len(paths)} static frames -> {out_dir}")


def run_dynamic(args, seq):
    from PIL import Image

    from creste_public_tpu.preprocessing import video_tracking as vt

    detector = vt.try_load_detector()
    masker = vt.try_load_mask_predictor()
    if detector is None or masker is None:
        print("WARNING: GroundingDINO/SAM weights unavailable; running the "
              "tracking algorithm over deterministic threshold blobs")
        detector = vt.FakeBlobDetector()
        masker = vt.FakeBoxMaskPredictor()
        propagator = vt.TemplateMaskPropagator()
    else:
        # SAM2's video predictor is replaced by the weights-free
        # template/IoU mask tracker (same VideoPropagator interface;
        # swap in a SAM2 backend here when its weights are available).
        propagator = vt.TemplateMaskPropagator()

    out_dir = os.path.join(args.root, "2d_sam_dynamic", args.cam, str(seq))
    os.makedirs(out_dir, exist_ok=True)
    paths, frames = frame_paths(args.root, args.cam, seq)
    if not paths:
        return
    if all(os.path.exists(os.path.join(out_dir, f"{f}.npy"))
           for f in frames):
        print(f"seq {seq}: dynamic labels already complete")
        return
    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    maps = vt.track_video(imgs, detector, masker, propagator,
                          step=args.step)
    for frame, m in zip(frames, maps):
        np.save(os.path.join(out_dir, f"{frame}.npy"), m)
    print(f"seq {seq}: {len(paths)} dynamic frames -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--cam", default="cam0")
    ap.add_argument("--mode", choices=["static", "dynamic"], default="static")
    ap.add_argument("--step", type=int, default=1,
                    help="dynamic: frames between re-detections")
    ap.add_argument("--workers", type=int, default=1,
                    help="thread-pool size over sequences (the HF model "
                         "kernels release the GIL; the reference shards "
                         "sequences across GPUs, create_sam_creste.sh)")
    args = ap.parse_args()

    from creste_public_tpu.utils.concurrency import parallel_map

    run = run_static if args.mode == "static" else run_dynamic
    parallel_map(lambda seq: run(args, seq), args.seqs,
                 workers=args.workers)


if __name__ == "__main__":
    main()
