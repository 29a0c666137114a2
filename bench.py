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

import json
import time

import numpy as np

BASELINE_HZ = 20.0  # reference: 20 Hz on a laptop GPU (README.md:18)


def main() -> None:
    import jax

    from __graft_entry__ import entry

    fn, (variables, rgbd, p2p) = entry()

    jfn = jax.jit(fn)

    # warmup + compile
    out = jfn(variables, rgbd, p2p)
    jax.block_until_ready(out)

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(variables, rgbd, p2p)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    p50 = float(np.percentile(times, 50))
    hz = 1.0 / p50
    print(
        json.dumps(
            {
                "metric": "single-frame RGBD->BEV reward inference rate",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / BASELINE_HZ, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
