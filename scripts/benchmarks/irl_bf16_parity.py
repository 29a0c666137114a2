"""Stage-3 bf16 parity ledger (VERDICT r4 weak #3 / next #4a).

The stage-3 `compute_dtype: bfloat16` mode casts ONLY the frozen backbone
(pipelines.make_loss_closure), trading exact parity for +13% samples/s
(211.9 -> 187.5 ms/step @ B=10, docs/TRAINING.md). That trade was recorded
without its number: the bf16 backbone changes `input_view`, hence the IRL
gradients. This tool records the ledger:

  * one-step loss + gradient deviation (trainable = non-backbone params)
    between the f32 and bf16-frozen-backbone loss closures on the SAME
    params/batch/rng,
  * converged-reward deviation: K full train steps per mode from the same
    init, then both final param trees evaluated through the SAME exact-f32
    inference graph — the deviation a practitioner actually inherits by
    training in the bf16 mode.

Reference anchor: the reference trains stage 3 in full f32
(creste/train_traversability.py:34-96, manual optimization); the bf16 mode
is a beyond-reference opt-in whose cost this ledger quantifies.

Usage: python scripts/benchmarks/irl_bf16_parity.py [--batch 10]
       [--steps 50]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import json

import numpy as np


def _tree_max_dev(a, b):
    import jax

    devs = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x, np.float64)
                                         - np.asarray(y, np.float64))))
        if hasattr(x, "dtype") else 0.0,
        a, b)
    return max(jax.tree_util.tree_leaves(devs) or [0.0])


def _tree_rel_dev(a, b):
    """max |a-b| / (RMS of a) per leaf — scale-aware gradient deviation."""
    import jax

    def rel(x, y):
        if not hasattr(x, "dtype"):
            return 0.0
        x64 = np.asarray(x, np.float64)
        rms = float(np.sqrt(np.mean(x64 ** 2))) or 1.0
        return float(np.max(np.abs(x64 - np.asarray(y, np.float64)))) / rms

    devs = jax.tree_util.tree_map(rel, a, b)
    return max(jax.tree_util.tree_leaves(devs) or [0.0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--steps", type=int, default=50,
                    help="train steps per mode for the converged-reward "
                         "comparison")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (CPU smoke of the harness itself)")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import (
        enable_compile_cache,
        ensure_env_platform,
    )

    ensure_env_platform()
    enable_compile_cache()

    import jax

    from creste_public_tpu.config import presets
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch
    from creste_public_tpu.training import pipelines

    B = args.batch
    make_cfg = (presets.tiny_traversability_config if args.tiny
                else presets.traversability_model_config)
    cfg32 = make_cfg()
    cfg32["batch_size"] = B
    cfg16 = make_cfg()
    cfg16["batch_size"] = B
    cfg16["compute_dtype"] = "bfloat16"

    if args.tiny:
        ds = SyntheticCodaDataset(
            length=B, image_size=(64, 80), ds=4, grid=32,
            map_range=1.6, fdn_dim=16, horizon=10)
    else:
        ds = SyntheticCodaDataset(length=B)
    batch = collate([ds[i] for i in range(B)])

    mesh = make_mesh()
    model32, lm, state, tx = pipelines.init_stage(
        "traversability", cfg32,
        jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch),
        steps_per_epoch=100,
    )
    model16 = pipelines.build_model("traversability", cfg16.to_dict())
    rng = jax.random.PRNGKey(0)
    sb = shard_batch(batch, mesh)

    line = {"metric": "stage-3 bf16-frozen-backbone parity ledger",
            "batch": B, "steps": args.steps}

    # ---- one-step loss + gradient deviation (same params/batch/rng) ----
    trainable = lambda p: {k: v for k, v in p.items()  # noqa: E731
                           if k != "backbone"}
    for name, model in (("f32", model32), ("bf16", model16)):
        closure = pipelines.make_loss_closure("traversability", model, lm)
        gfn = jax.jit(jax.value_and_grad(
            lambda p: closure(p, state.batch_stats, batch, rng)[0]))
        loss, grads = gfn(state.params)
        jax.block_until_ready((loss, grads))
        line[f"{name}_step1_loss"] = float(loss)
        if name == "f32":
            g32 = trainable(grads)
        else:
            g16 = trainable(grads)
    line["grad_max_abs_dev"] = round(_tree_max_dev(g32, g16), 8)
    line["grad_max_rel_dev"] = round(_tree_rel_dev(g32, g16), 6)
    print("one-step:", {k: v for k, v in line.items() if "grad" in k
                        or "loss" in k}, flush=True)

    # ---- converged-reward deviation: K steps per mode, same init ----
    finals = {}
    for name, model in (("f32", model32), ("bf16", model16)):
        step = pipelines.make_train_step(
            "traversability", model, lm, tx, mesh, donate=False)
        cur = state
        for i in range(args.steps):
            cur, metrics = step(cur, sb, jax.random.fold_in(rng, i))
        jax.block_until_ready(cur.params)
        finals[name] = cur.params
        line[f"{name}_final_loss"] = float(metrics["loss"])
        print(f"{name}: {args.steps} steps, final loss "
              f"{float(metrics['loss']):.5f}", flush=True)

    line["trained_param_max_dev"] = round(
        _tree_max_dev(trainable(finals["f32"]), trainable(finals["bf16"])), 8)

    # both final trees through the SAME exact-f32 inference graph: the
    # reward-map deviation a user inherits from bf16 training
    infer_cfg = cfg32.to_dict()
    infer_cfg["solve_mdp"] = False
    imodel = pipelines.build_model("traversability", infer_cfg)
    inputs = pipelines.model_inputs(
        "traversability", jax.tree_util.tree_map(jax.numpy.asarray, batch))
    ifn = jax.jit(lambda v: imodel.apply(
        {"params": v, "batch_stats": state.batch_stats},
        *inputs, train=False)["traversability_preds"])
    r32 = np.asarray(ifn(finals["f32"]))
    r16 = np.asarray(ifn(finals["bf16"]))
    span = float(r32.max() - r32.min()) or 1.0
    line["converged_reward_max_dev"] = round(float(
        np.max(np.abs(r32 - r16))), 8)
    line["converged_reward_rel_dev"] = round(float(
        np.max(np.abs(r32 - r16))) / span, 6)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
