"""Depth-only training CLI (reference stage-0: CODatasetDepth +
CODaDepthModule, creste/datasets/coda_dataloader_depth.py:23,
dataloader.py:17).

Usage:
  python -m creste_public_tpu.train_depth trainer=smoke dataset=synthetic_tiny
"""
from creste_public_tpu.cli import launch


def main(argv=None):
    return launch("depth", argv)


if __name__ == "__main__":
    main()
