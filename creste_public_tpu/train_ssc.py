"""Stage-2 training CLI: TerrainNet BEV backbone with SAM2-static SupCon,
dynamic CE, elevation regression and joint DINOv2 distillation
(reference: creste/train_ssc.py:271-367).

Usage:
  python -m creste_public_tpu.train_ssc trainer=standard_single \
      model.weights_path=ckpts/stage1/step_100
"""
from creste_public_tpu.cli import launch


def main(argv=None):
    return launch("ssc_sam", argv)


if __name__ == "__main__":
    main()
