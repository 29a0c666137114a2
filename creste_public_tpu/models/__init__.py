from creste_public_tpu.models.depth_completion import DepthCompletion, VisionEncoder
from creste_public_tpu.models.distillation import DistillationBackbone
from creste_public_tpu.models.terrainnet import TerrainNet
from creste_public_tpu.models.lfd import MaxEntIRL

__all__ = [
    "DepthCompletion",
    "VisionEncoder",
    "DistillationBackbone",
    "TerrainNet",
    "MaxEntIRL",
]
