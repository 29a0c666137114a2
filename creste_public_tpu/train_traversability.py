"""Stage-3 training CLI: MaxEnt IRL (+ counterfactual) reward learning over
the frozen TerrainNet backbone (reference: creste/train_traversability.py:333-425).

Usage:
  python -m creste_public_tpu.train_traversability trainer=smoke \
      model.vision_backbone.weights_path=ckpts/stage2/step_200
"""
from creste_public_tpu.cli import launch


def main(argv=None):
    return launch("traversability", argv)


if __name__ == "__main__":
    main()
