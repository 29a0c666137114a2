"""Micro-benchmark: the VIN reward head (MultiScaleFCN) alone on the chip.

The deployment-graph stage breakdown attributes ~2.2 ms of the 7.6 ms
frame to "+VIN reward" — but that delta includes DCE effects. This times
the head standalone at its real input shape [1, 64, 128, 40] (7 convs +
7 BNs, ~1.6 GFLOP => if it costs ms it is op-launch/latency-bound, the
case for a fused Pallas kernel).

Usage: python scripts/benchmarks/reward_head_bench.py [--iters 200]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from creste_public_tpu.config import presets
    from creste_public_tpu.models.blocks.convnets import MultiScaleFCN
    from creste_public_tpu.runtime.benchmark import serialized_latency

    cfg = presets.traversability_model_config().to_dict()
    rc = cfg["traversability_head"]["net_kwargs"]["reward_cfg"]
    model = MultiScaleFCN(rc["net_kwargs"])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 40)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    # perturb batch_stats away from the trivial mean=0/var=1 init so the
    # parity print below exercises the real BN-fold algebra (unit tests
    # cover non-trivial stats; this keeps the bench honest too)
    if "batch_stats" in variables:
        from flax import traverse_util

        flat = traverse_util.flatten_dict(dict(variables["batch_stats"]))
        flat = {
            k: jnp.asarray(
                rng.uniform(0.4, 1.8, v.shape)  # var: positive
                if k[-1] == "var"
                else rng.normal(0, 0.5, v.shape),  # mean: signed
                v.dtype,
            )
            for k, v in flat.items()
        }
        variables = dict(variables)
        variables["batch_stats"] = traverse_util.unflatten_dict(flat)

    def fn(v, x, _unused):
        return {"r": model.apply(v, x, False)}

    per, single = serialized_latency(fn, variables, x, None, "r",
                                     n_long=args.iters, repeats=3)
    print(f"reward head standalone [flax  ]: {per*1e6:8.1f} us/call "
          f"(tunnel single-call {single*1e3:.2f} ms)")

    from creste_public_tpu.ops.reward_pallas import msfcn_fused_apply

    def fnf(v, x, _unused):
        return {"r": msfcn_fused_apply(v, x)}

    perf_, single_f = serialized_latency(fnf, variables, x, None, "r",
                                         n_long=args.iters, repeats=3)
    print(f"reward head standalone [pallas]: {perf_*1e6:8.1f} us/call "
          f"(tunnel single-call {single_f*1e3:.2f} ms)")
    dev = float(jnp.max(jnp.abs(fn(variables, x, None)["r"]
                                - fnf(variables, x, None)["r"])))
    print(f"fused max deviation: {dev:.2e}")


if __name__ == "__main__":
    main()
