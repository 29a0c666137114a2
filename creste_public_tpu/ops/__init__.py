from creste_public_tpu.ops.splat import splat_bilinear, splat_to_bev
from creste_public_tpu.ops.value_iteration import (
    value_iteration,
    bellman_kernels,
    DYNAMICS,
)
from creste_public_tpu.ops.svf import expected_svf, greedy_rollout, sharpen_policy
from creste_public_tpu.ops.rasterize import rasterize_trajectory

__all__ = [
    "splat_bilinear",
    "splat_to_bev",
    "value_iteration",
    "bellman_kernels",
    "DYNAMICS",
    "expected_svf",
    "greedy_rollout",
    "sharpen_policy",
    "rasterize_trajectory",
]
