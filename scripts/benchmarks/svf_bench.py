"""Micro-benchmark: expected-SVF propagation, XLA scan vs Pallas kernel.

The stage-3 IRL train step is latency-bound on the sequential VI/SVF
recurrences (STATUS.md roofline). ops/vi_pallas.py already moved value
iteration into one VMEM-resident launch (153 -> 30 ms); this times the
other recurrence at the training shape [10, 64, 128, 8], horizon 50
(reference lfd.py action_horizon).

Usage: python scripts/benchmarks/svf_bench.py [--iters 50] [--batch 10]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--horizon", type=int, default=50)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from creste_public_tpu.ops.svf import expected_svf
    from creste_public_tpu.runtime.benchmark import serialized_latency

    B, H, W = args.batch, 64, 128
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, H, W, 8)).astype(np.float32)
    policy = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    s0 = jnp.asarray(rng.integers(0, H * W // 2, size=B))
    s1 = jnp.asarray(rng.integers(0, H * W // 2, size=B))

    for backend in ("xla", "pallas"):
        def fn(variables, pol, _unused, _backend=backend):
            s0_, s1_ = variables
            return {"mu": expected_svf(pol, s0_, s1_, args.horizon,
                                       zero_terminal_state=True,
                                       backend=_backend)}

        per, single = serialized_latency(
            fn, (s0, s1), policy, None, "mu",
            n_long=args.iters, repeats=3,
        )
        print(f"expected_svf[{backend:6s}] B={B} T={args.horizon}: "
              f"{per*1e3:8.3f} ms/call (tunnel single {single*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
