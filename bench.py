"""Headline benchmark: single-frame RGB-D -> BEV reward inference rate.

Reference baseline: 20 Hz end-to-end on a laptop GPU (README.md:18); the
north-star for this build is >=100 Hz/chip on TPU v5e (BASELINE.json).
Runs the deployment graph (MaxEntIRL with solve_mdp=False — the same graph
the reference exports via torch.jit.trace, compile.py:170-210) at the
production shape [1, 1, 4, 512, 612] and reports p50 latency-derived Hz.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N}
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_HZ = 20.0  # reference: 20 Hz on a laptop GPU (README.md:18)


def measure_hz(jfn, *args, iters: int = 50) -> float:
    import jax

    out = jfn(*args)  # warmup + compile
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return 1.0 / float(np.percentile(times, 50))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="also benchmark bfloat16-cast weights and report "
                         "the reward-map deviation vs f32 (opt-in: not "
                         "parity-compatible)")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import entry

    fn, (variables, rgbd, p2p) = entry()
    jfn = jax.jit(fn)
    hz = measure_hz(jfn, variables, rgbd, p2p)

    line = {
        "metric": "single-frame RGBD->BEV reward inference rate",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
    }

    if args.bf16:
        from creste_public_tpu.runtime.precision import (
            cast_variables,
            max_abs_deviation,
        )

        out_f32 = jax.jit(fn)(variables, rgbd, p2p)
        vb = cast_variables(variables)
        hz_bf16 = measure_hz(jfn, vb, rgbd, p2p)
        out_bf16 = jfn(vb, rgbd, p2p)
        key = ("traversability_preds"
               if isinstance(out_f32, dict)
               and "traversability_preds" in out_f32 else None)
        dev = max_abs_deviation(
            out_f32[key] if key else out_f32,
            out_bf16[key] if key else out_bf16,
        )
        line["bf16_hz"] = round(hz_bf16, 2)
        line["bf16_reward_max_dev"] = round(dev, 6)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
