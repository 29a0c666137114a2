"""Deployment runtime: AOT export + serving of the inference graph.

Replaces the reference's TorchScript deployment boundary
(scripts/runtime/compile.py:160-210 -> creste_rgbd_trace.pt consumed by the
external creste_realtime C++ repo): here the inference graph is a jitted
JAX function exported with `jax.export` (StableHLO) — loadable from any
PJRT runtime, including C++ hosts — plus an in-process `InferenceEngine`
for latency-critical serving.
"""
from creste_public_tpu.runtime.export import (  # noqa: F401
    InferenceEngine,
    build_inference_fn,
    export_inference_graph,
    load_exported,
)
