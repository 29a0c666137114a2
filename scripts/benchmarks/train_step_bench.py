"""Stage-2 training-step benchmark at production shapes.

Measures the full SPMD train step (TerrainNet forward at 512x612, full
stage-2 loss stack incl. SupCon, backward, psum grads, optimizer update)
at a given batch size on the real chip, optionally with bf16 compute
(`model.compute_dtype=bfloat16`).

Usage: python scripts/benchmarks/train_step_bench.py [--batch 16]
       [--iters 20] [--dtype float32|bfloat16] [--stage ssc|traversability]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--stage", default="ssc",
                    choices=["ssc", "traversability"])
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax

    from creste_public_tpu.config import presets
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
    from creste_public_tpu.training import pipelines
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch

    if args.stage == "ssc":
        cfg = presets.terrainnet_model_config()
        task = "joint"
    else:
        cfg = presets.traversability_model_config()
        task = None
    if args.dtype != "float32":
        cfg["compute_dtype"] = args.dtype
    cfg["batch_size"] = args.batch

    ds = SyntheticCodaDataset(length=args.batch)
    batch = collate([ds[i] for i in range(args.batch)])
    if args.stage == "ssc":
        batch = {k: v for k, v in batch.items()
                 if k not in ("counterfactuals_label",)}

    mesh = make_mesh()
    model, lm, state, tx = pipelines.init_stage(
        args.stage, cfg,
        jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch),
        steps_per_epoch=100,
    )
    step = pipelines.make_train_step(args.stage, model, lm, tx, mesh,
                                     task=task, donate=False)

    sb = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)
    state2, metrics = step(state, sb, rng)
    jax.block_until_ready((state2, metrics))
    print("step-1 loss:", float(metrics["loss"]),
          "grad_norm:", float(metrics["grad_norm"]))

    times = []
    cur = state
    for i in range(args.iters):
        t0 = time.perf_counter()
        cur, metrics = step(cur, sb, jax.random.fold_in(rng, i))
        jax.block_until_ready((cur, metrics))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50)) * 1e3
    print("final loss:", float(metrics["loss"]))
    print(f"stage {args.stage} train step dtype={args.dtype} "
          f"batch={args.batch}: "
          f"{p50:.1f} ms p50 -> {args.batch * 1000.0 / p50:.1f} samples/s")

    # MFU / roofline accounting (VERDICT r2 #3)
    from creste_public_tpu.runtime.benchmark import cost_stats, mfu_fields

    try:
        cs = cost_stats(lambda s, b, r: step(s, b, r), state, sb, rng)
        fields = mfu_fields(cs["flops"], cs["bytes"], p50 / 1e3)
        print("train-step cost:", fields)
    except Exception as e:
        print("cost_analysis unavailable:", str(e)[:120])


if __name__ == "__main__":
    main()
