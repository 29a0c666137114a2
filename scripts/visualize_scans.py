"""CLI: interactive scan viewer over a CODa tree (LaserScanVis analog).

The reference's `creste/utils/pointcloud_vis.py` is run directly as a
vispy window over a sequence's scans (:101 LaserScanVis; N/B keys step
frames). Here the interactive surface is a self-contained HTML file
(utils.pointcloud_vis.export_html_viewer — software z-buffer splat, no
GL/vispy/server needed): point it at a dataset root + sequence, open the
output in any browser.

Usage:
  python scripts/visualize_scans.py --root data/creste --seq 0 \
      [--frames 0 10 20] [--out scans.html] [--labels 3d_semantic]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo root (scripts are not installed)
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seq", default="0")
    ap.add_argument("--frames", type=int, nargs="*", default=None,
                    help="frame ids (default: first 10)")
    ap.add_argument("--out", default="scans.html")
    ap.add_argument("--labels", default=None,
                    help="per-point label dir (e.g. 3d_semantic) for the "
                         "label color mode")
    ap.add_argument("--point-size", type=int, default=2)
    args = ap.parse_args()

    from creste_public_tpu.data import coda_constants as cc
    from creste_public_tpu.utils.pointcloud_vis import export_html_viewer

    pc_dir = _os.path.join(args.root, cc.POINTCLOUD_DIR, cc.DEFAULT_LIDAR,
                           str(args.seq))
    frames = args.frames
    if frames is None:
        names = sorted(
            f for f in _os.listdir(pc_dir) if f.endswith(".bin")
        )[:10]
        frames = [cc.parse_frame(n) for n in names]

    scans, labels = [], []
    for fr in frames:
        path = cc.frame_path(args.root, cc.POINTCLOUD_DIR, cc.DEFAULT_LIDAR,
                             str(args.seq), fr, "bin")
        pts = np.fromfile(path, np.float32).reshape(-1, cc.OUSTER_FEATURES)
        scans.append(pts[:, :4])  # xyz + intensity
        lab = None
        if args.labels:
            lp = _os.path.join(args.root, args.labels, str(args.seq),
                               f"{fr}.bin")
            if _os.path.exists(lp):
                lab = np.fromfile(lp, np.uint32)[: len(pts)]
        labels.append(lab)

    out = export_html_viewer(
        args.out, scans, labels=labels, point_size=args.point_size,
        title=f"seq {args.seq} ({len(scans)} scans)",
    )
    print(f"wrote {out} ({_os.path.getsize(out) / 1e6:.1f} MB) — open in "
          f"any browser; N/B step scans, C cycles color modes")


if __name__ == "__main__":
    main()
