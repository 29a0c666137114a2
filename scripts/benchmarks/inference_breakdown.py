"""Inference-graph stage breakdown on the real chip.

Times the deployed reward graph cumulatively by stage so optimization
effort lands where the microseconds are:

  backbone : EffNet-b0 + depth head + dino head (DistillationBackbone)
  +splat   : + Camera2MapMulti scatter to the 256x256 BEV grid
  +decoder : + ResNet18 multi-head BEV decoder   (= full TerrainNet)
  full     : + VIN reward head                   (= deployment graph)

Also reports batched throughput (samples/s at --batch) — the serving
sweet spot differs from the batch-1 latency headline.

Usage: python scripts/benchmarks/inference_breakdown.py [--iters 50]
       [--batch 8]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse

from creste_public_tpu.runtime.benchmark import serialized_latency


def stage_ms(fn, variables, rgbd, p2p, out_key, iters):
    """On-chip serialized per-frame ms (see runtime/benchmark.py — naive
    identical-input loops are deduped by the tunnel runtime)."""
    per, _ = serialized_latency(fn, variables, rgbd, p2p, out_key,
                                n_long=iters, repeats=3)
    return per * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30,
                    help="scan length for the serialized measurement")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16", action="store_true",
                    help="attribute the bf16 stream-mode graph instead "
                         "(per-stage share of its small-op latency floor, "
                         "VERDICT r4 #4)")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax

    from __graft_entry__ import _example_inputs, entry
    from creste_public_tpu.config import presets
    from creste_public_tpu.config.config import Config
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.models.terrainnet import TerrainNet

    cfg = presets.traversability_model_config()
    cfg["solve_mdp"] = False
    cfg_dict = cfg.to_dict()
    terrain_cfg = cfg_dict["vision_backbone"]
    if args.bf16:
        cfg_dict["compute_dtype"] = "bfloat16"
        terrain_cfg["compute_dtype"] = "bfloat16"
    model = MaxEntIRL(cfg_dict)
    rgbd, p2p = _example_inputs(Config(terrain_cfg))
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    if args.bf16:
        from creste_public_tpu.runtime.precision import cast_variables

        variables = cast_variables(variables)

    tnet = TerrainNet(terrain_cfg)
    tvars = {"params": variables["params"]["backbone"],
             "batch_stats": variables.get("batch_stats", {}).get(
                 "backbone", {})}

    def backbone_only(v, r, p):
        import jax.numpy as jnp

        from creste_public_tpu.models.distillation import DistillationBackbone

        m = DistillationBackbone(terrain_cfg)
        dv = {"params": v["params"]["depthcomp"],
              "batch_stats": v["batch_stats"].get("depthcomp", {})}
        return m.apply(dv, r, p, train=False)["depth_preds_metric"]

    def terrain_full(v, r, p):
        return TerrainNet(terrain_cfg).apply(
            v, r, p, None, False)["inpainting_sam_preds"]

    fn, _ = entry(compute_dtype="bfloat16" if args.bf16 else None,
                  variables=variables)

    stages = [
        ("backbone (EffNet+heads)", backbone_only, tvars, None),
        ("full TerrainNet (+splat+decoder)", terrain_full, tvars, None),
        ("deployment graph (+VIN reward)", fn, variables,
         "traversability_preds"),
    ]

    # B=1 vs B=N per-stage attribution (VERDICT r4 #1: the batched serving
    # graph's HBM util collapses 94%->61% — find WHICH stage's per-frame
    # time inflates under batching)
    B = max(args.batch, 1)
    rgbd_b, p2p_b = (rgbd, p2p) if B == 1 else _example_inputs(
        Config(terrain_cfg), B=B)
    for name, f, v, key in stages:
        ms1 = stage_ms(f, v, rgbd, p2p, key, args.iters)
        line = f"{name:36s}: {ms1:7.3f} ms/frame  ({1000.0 / ms1:7.1f} Hz)"
        if B > 1:
            msb = stage_ms(f, v, rgbd_b, p2p_b, key, args.iters) / B
            line += (f"  | B={B}: {msb:7.3f} ms/frame "
                     f"({1000.0 / msb:7.1f} fps, x{msb / ms1:.2f})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
