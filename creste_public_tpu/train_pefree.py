"""Stage-1 training CLI: RGB-D depth completion + PE-free DINOv2 feature
distillation (reference: creste/train_pefree.py:202-313).

Usage:
  python -m creste_public_tpu.train_pefree trainer=smoke \
      model.batch_size=2 dataset.train.length=4
"""
from creste_public_tpu.cli import launch


def main(argv=None):
    return launch("distillation", argv)


if __name__ == "__main__":
    main()
