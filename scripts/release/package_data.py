"""CLI: mini-release packager (reference: scripts/release/package_data.py):
collects windowed frames around counterfactual-annotated samples into a
portable archive preserving the CODa layout."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import glob
import os
import tarfile


FRAME_DIRS = [
    ("2d_rect/cam0", "jpg", True),
    ("3d_raw/os1", "bin", True),
    ("distillation/cam0", "npy", False),
    ("3d_sam", "npy", False),
    ("3d_sam_dynamic", "npy", False),
    ("elevation", "npy", False),
    ("counterfactuals", "pkl", False),
]
META_DIRS = ["calibrations", "poses", "splits", "traversability"]


def frame_files(root, subdir, seq, frame, ext, codec):
    if codec:
        mod, cam = subdir.split("/")
        return [os.path.join(root, subdir, str(seq),
                             f"{mod}_{cam}_{seq}_{frame}.{ext}")]
    return [os.path.join(root, subdir, str(seq), f"{frame}.{ext}")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default="creste_mini_release.tar.gz")
    ap.add_argument("--window", type=int, default=5,
                    help="frames around each counterfactual sample")
    args = ap.parse_args()

    picked = []
    for pkl in glob.glob(os.path.join(args.root, "counterfactuals", "*", "*.pkl")):
        seq = os.path.basename(os.path.dirname(pkl))
        frame = int(os.path.splitext(os.path.basename(pkl))[0])
        for f in range(frame - args.window, frame + args.window + 1):
            picked.append((seq, f))
    picked = sorted(set(picked))
    print(f"{len(picked)} (seq, frame) pairs around counterfactual samples")

    with tarfile.open(args.out, "w:gz") as tar:
        for d in META_DIRS:
            p = os.path.join(args.root, d)
            if os.path.isdir(p):
                tar.add(p, arcname=d)
        n = 0
        for seq, frame in picked:
            for subdir, ext, codec in FRAME_DIRS:
                for path in frame_files(args.root, subdir, seq, frame, ext, codec):
                    if os.path.exists(path):
                        tar.add(path, arcname=os.path.relpath(path, args.root))
                        n += 1
        # depth label dirs (any generated variant)
        for ddir in glob.glob(os.path.join(args.root, "depth_*")):
            for seq, frame in picked:
                for path in glob.glob(
                    os.path.join(ddir, "*", str(seq), f"{frame}.png")
                ):
                    tar.add(path, arcname=os.path.relpath(path, args.root))
                    n += 1
    print(f"packaged {n} frame files -> {args.out}")


if __name__ == "__main__":
    main()
