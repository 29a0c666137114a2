"""CLI: AOT-export the deployment inference graph (reference:
scripts/runtime/compile.py -> torch.jit.trace; here -> jax.export StableHLO).

Usage:
  python scripts/runtime/compile.py --out creste_rgbd_export.bin \
      [--ckpt ckpts/stage3] [--tiny]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="creste_rgbd_export.bin")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--latency", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="export the mixed-precision graph: bf16 activation "
                         "stream + bf16 non-norm weights, f32 geometry "
                         "islands (runtime/precision.py; opt-in, not "
                         "parity-exact)")
    ap.add_argument("--fused", action="store_true",
                    help="export with the fused Pallas reward head "
                         "(ops/reward_pallas.py; parity-safe BN-fold — "
                         "TPU-only artifact when exported on TPU)")
    ap.add_argument("--native-dir", default=None,
                    help="also write the native-host artifact (weights-"
                         "closed StableHLO + manifest) for "
                         "native/creste_serve (PJRT C API host)")
    ap.add_argument("--native-platform", default=None,
                    help="lowering platform for --native-dir (e.g. 'tpu' "
                         "to build a TPU artifact from a CPU host)")
    ap.add_argument("--native-outputs", default=None,
                    help="comma-separated output keys to keep in the "
                         "native artifact (default: all)")
    args = ap.parse_args()

    import jax

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.config import presets
    from creste_public_tpu.runtime.export import (
        InferenceEngine, build_inference_fn, export_inference_graph,
    )
    from creste_public_tpu.models.lfd import MaxEntIRL

    cfg = (presets.tiny_traversability_config() if args.tiny
           else presets.traversability_model_config())
    cfg["solve_mdp"] = False
    if args.bf16:
        cfg["compute_dtype"] = "bfloat16"
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 20000.0
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))

    model = MaxEntIRL(cfg.to_dict())
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    if args.ckpt:
        from creste_public_tpu.training.surgery import load_raw_checkpoint

        raw = load_raw_checkpoint(args.ckpt)
        variables = {"params": raw.get("params", raw),
                     "batch_stats": raw.get("batch_stats", {})}

    if args.bf16:
        from creste_public_tpu.runtime.precision import cast_variables

        variables = cast_variables(variables)

    fn, _ = build_inference_fn(cfg, variables, fused_reward=args.fused)
    _, blob = export_inference_graph(fn, variables, rgbd, p2p, args.out)
    print(f"exported {len(blob)/1e6:.2f} MB StableHLO to {args.out}")

    if args.native_dir:
        from creste_public_tpu.runtime.export import export_native_artifacts

        info = export_native_artifacts(
            cfg, variables, rgbd, p2p, args.native_dir,
            platform=args.native_platform, fused_reward=args.fused,
            output_keys=(args.native_outputs.split(",")
                         if args.native_outputs else None),
        )
        print(f"native artifact: {info['module_bytes']/1e6:.2f} MB module, "
              f"{info['num_outputs']} outputs -> {args.native_dir} "
              f"(serve: native/build/creste_serve --artifact "
              f"{args.native_dir})")

    if args.latency:
        eng = InferenceEngine(cfg, variables, fused_reward=args.fused)
        print(eng.latency_stats(rgbd, p2p))


if __name__ == "__main__":
    main()
