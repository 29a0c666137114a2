"""Artifact-proof latency measurement for tunnel-attached TPUs.

The axon tunnel runtime memoizes (program, arguments) executions: naive
timing loops over identical inputs measure cache hits (sub-ms "latencies"
for multi-ms graphs). The scan-difference method here is immune:

  * the model runs inside lax.scan with an output-feedback input
    perturbation — iteration i+1 depends on iteration i's output, so
    executions cannot be deduped, reordered, or pipelined;
  * every timed call gets a FRESH device-resident input;
  * per-frame latency = (T_scan(N) - T_scan(1)) / (N - 1), cancelling the
    per-call tunnel/RPC overhead (tens of ms over the tunnel; not present
    in real host-attached deployment).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np


def serialized_latency(
    fn: Callable,
    variables,
    rgbd,
    p2p,
    out_key: str,
    n_long: int = 50,
    repeats: int = 5,
    perturb_slice=(Ellipsis, slice(0, 3)),
) -> tuple[float, float]:
    """On-chip serialized per-frame latency of ``fn(variables, rgbd, p2p)``.

    Returns (per_frame_seconds, single_call_seconds). ``out_key`` selects
    the output tensor used for the feedback perturbation.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def loop_fn(variables, rgbd, p2p, n):
        def body(carry, _):
            r, acc = carry
            out = fn(variables, r, p2p)
            tp = out[out_key] if isinstance(out, dict) else out
            return (r + tp.mean() * 1e-12, acc + tp.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (rgbd, jnp.float32(0)), None, length=n
        )
        return acc

    # Non-deterministic perturbation seed: the tunnel memoization persists
    # ACROSS PROCESSES, so a fixed-seed perturbation sequence replays the
    # exact (program, args) pairs of any earlier run of the same bench and
    # times cache hits (caught via preproc_bench printing -0.0 ms/frame
    # for a 13.6 ms/frame chain; this path was exposed the same way).
    import os

    rng = np.random.default_rng(os.getpid() ^ time.time_ns())
    base = np.asarray(rgbd)

    def fresh():
        r = base.copy()
        r[perturb_slice] = rng.uniform(
            0, 1, r[perturb_slice].shape
        ).astype(r.dtype)
        d = jax.device_put(jnp.asarray(r))
        jax.block_until_ready(d)
        return d

    medians = {}
    for n in (1, n_long):
        float(loop_fn(variables, fresh(), p2p, n))  # compile + drain
        ts = []
        for _ in range(repeats):
            x = fresh()
            t0 = time.perf_counter()
            # Fence on the VALUE (D2H fetch), not block_until_ready: the
            # tunnel runtime is intermittently lazy and block_until_ready
            # was observed returning in ~0.1 ms for multi-ms programs
            # (scripts/benchmarks/preproc_bench.py investigation). The
            # fetch round-trip cancels in the scan-length difference.
            float(loop_fn(variables, x, p2p, n))
            ts.append(time.perf_counter() - t0)
        medians[n] = float(np.median(ts))
    per_frame = (medians[n_long] - medians[1]) / (n_long - 1)
    return per_frame, medians[1]


# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM bandwidth. f32 convs/matmuls on v5e execute through the
# bf16 MXU at roughly half rate; we report MFU against the bf16 peak
# (the conservative denominator) and note the f32 factor separately.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def cost_stats(fn: Callable, *args) -> dict:
    """Analytical per-execution cost from the compiled executable:
    {'flops': ..., 'bytes': ...} via XLA's cost_analysis."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def mfu_fields(flops: float, bytes_: float, seconds: float) -> dict:
    """Roofline summary fields for a measured per-execution latency."""
    achieved = flops / seconds
    bw = bytes_ / seconds
    return {
        "flops_per_frame": round(flops / 1e9, 3),  # GFLOP
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_vs_bf16_peak": round(achieved / V5E_PEAK_BF16_FLOPS, 4),
        "hbm_gbps": round(bw / 1e9, 1),
        "hbm_bw_util": round(bw / V5E_HBM_BYTES_PER_S, 4),
        "arith_intensity": round(flops / max(bytes_, 1.0), 2),
    }
