"""bf16 stream-mode reward-map deviation statistics (the parity ledger).

bench.py --bf16 records only the MAX deviation (0.318 on v5e, round 5) —
a single-pixel statistic on a [0, 0.58] reward span. This tool reports the
distribution (max / mean / p99 / relative-to-span) plus the rank-order
agreement that matters for a *reward* map (the planner consumes relative
orderings, not absolute values). Runs on any backend: the deviation is
dominated by bf16 rounding, not backend conv precision (CPU vs TPU f32
conv differences are ~1e-5 at this depth; noted in the output).

Usage: python scripts/benchmarks/bf16_dev_stats.py [--n 4]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4,
                    help="number of random input frames to aggregate over")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import (
        enable_compile_cache,
        ensure_env_platform,
    )

    ensure_env_platform()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry
    from creste_public_tpu.runtime.precision import cast_variables

    fn, (variables, rgbd, p2p) = entry()
    fn16, _ = entry(compute_dtype="bfloat16", variables=variables)
    vb = cast_variables(variables)
    j32 = jax.jit(fn)
    j16 = jax.jit(fn16)

    rng = np.random.default_rng(0)
    base = np.asarray(rgbd)
    devs, spans, taus = [], [], []
    stats = None
    for i in range(args.n):
        r = base.copy()
        r[..., :3] = rng.uniform(0, 1, r[..., :3].shape).astype(r.dtype)
        x = jnp.asarray(r)
        a = np.asarray(j32(variables, x, p2p)["traversability_preds"],
                       np.float64).ravel()
        b = np.asarray(j16(vb, x, p2p)["traversability_preds"],
                       np.float64).ravel()
        d = np.abs(a - b)
        devs.append(d)
        spans.append(a.max() - a.min())
        # rank-order agreement (Spearman rho over the reward map): the
        # IRL planner consumes orderings, so this is the deployment-
        # relevant fidelity number
        ra = np.argsort(np.argsort(a)).astype(np.float64)
        rb = np.argsort(np.argsort(b)).astype(np.float64)
        taus.append(float(np.corrcoef(ra, rb)[0, 1]))
    d = np.concatenate(devs)
    span = float(np.mean(spans))
    stats = {
        "metric": "bf16 stream-mode reward-map deviation vs f32",
        "frames": args.n,
        "backend": jax.devices()[0].platform,
        "reward_span_mean": round(span, 6),
        "dev_max": round(float(d.max()), 6),
        "dev_mean": round(float(d.mean()), 6),
        "dev_p99": round(float(np.percentile(d, 99)), 6),
        "dev_max_rel_span": round(float(d.max()) / span, 4),
        "dev_mean_rel_span": round(float(d.mean()) / span, 6),
        "spearman_rho_mean": round(float(np.mean(taus)), 6),
        "spearman_rho_min": round(float(np.min(taus)), 6),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
