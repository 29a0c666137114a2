"""On-device preprocessing kernel throughput: the offline label pipeline.

The reference's label generation is CPU NumPy/numba under Pool(24)
(build_dense_depth.py, build_feature_map.py); here the hot kernels are
jitted XLA ops, so a single chip replaces the pool. This measures the
per-frame kernel chain at production shapes:

  LiDAR scan [131072, 3] -> z-buffer depth projection (512x612)
                         -> grid-form IDW infill
  LiDAR scan             -> BEV elevation maps (256x256: min/max/var +
                            ground/overhang gap-scan)

Methodology: lax.scan over F frames with input derived from the loop
index (fresh data each iteration, immune to the tunnel's (program, args)
memoization — see runtime/benchmark.py); per-frame =
(T(F2) - T(F1))/(F2 - F1). The spread F2 - F1 must dwarf the tunnel
round-trip jitter (several ms per call): the kernel chain itself is
~0.1 ms/frame, so the default spread is 500 frames (~50 ms of compute,
>> jitter). The original 30-frame spread measured tunnel noise and
printed a negative rate.

Usage: python scripts/benchmarks/preproc_bench.py [--frames 500] [--points 131072]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500,
                    help="scan-length spread (>= 2; per-frame = "
                         "(T(F1+F)-T(F1))/F; must dwarf tunnel jitter)")
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--img", type=int, nargs=2, default=(512, 612))
    ap.add_argument("--grid", type=int, default=256)
    args = ap.parse_args()
    if args.frames < 2:
        ap.error("--frames must be >= 2 (scan-difference needs two points)")

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from creste_public_tpu.ops.depth_projection import points_to_depth
    from creste_public_tpu.ops.elevation import elevation_maps_from_points
    from creste_public_tpu.ops.infill import idw_densify

    rng = np.random.default_rng(0)
    N = args.points
    base = np.stack([
        rng.uniform(0.5, 25.0, N),      # x fwd
        rng.uniform(-12.0, 12.0, N),    # y left
        rng.uniform(-1.5, 3.0, N),      # z up
    ], axis=1).astype(np.float32)
    H, W = args.img
    fx = fy = 0.9 * W
    P = np.array([[fx, 0, W / 2, 0], [0, fy, H / 2, 0], [0, 0, 1, 0]],
                 np.float32)

    def frame_chain(points):
        depth = points_to_depth(points, jnp.asarray(P), (H, W))
        dense = idw_densify(None, depth=depth, window=4)
        elev = elevation_maps_from_points(
            points, (args.grid, args.grid), 12.8)
        return (dense.sum()
                + sum(jnp.sum(v) for v in elev.values()))

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(points0, n):
        def body(carry, i):
            pts = points0 + (i.astype(jnp.float32) * 1e-4)[None, None]
            return carry + frame_chain(pts), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return out

    def fresh():
        # a FRESH device-put input per timed call: a tunnel-attached
        # runtime memoizes (program, args), so re-executing on the same
        # buffer would time cache hits (runtime/benchmark.py discipline)
        jitter = rng.uniform(-1e-3, 1e-3, base.shape).astype(np.float32)
        x = jax.device_put(jnp.asarray(base + jitter))
        jax.block_until_ready(x)
        return x

    def timed(n, reps=5):
        jax.block_until_ready(run(fresh(), n))  # compile
        ts = []
        for _ in range(reps):
            x = fresh()
            t0 = time.perf_counter()
            jax.block_until_ready(run(x, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(np.std(ts))

    n1 = 10
    (t1, s1), (tf, s2) = timed(n1), timed(n1 + args.frames)
    per_frame = (tf - t1) / args.frames
    line = {
        "metric": "preprocessing kernel chain (z-buffer + IDW + elevation)",
        "per_frame_ms": round(per_frame * 1e3, 4),
        "frames_per_s": round(1.0 / per_frame, 1) if per_frame > 0 else None,
        "call_jitter_ms": round(max(s1, s2) * 1e3, 2),
        "frames_spread": args.frames,
        "points": N,
        "img": [H, W],
        "grid": args.grid,
        "backend": jax.default_backend(),
    }
    if per_frame <= 0 or args.frames * per_frame < 10 * max(s1, s2):
        line["warning"] = ("spread not well above call jitter; raise "
                           "--frames for a trustworthy rate")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
