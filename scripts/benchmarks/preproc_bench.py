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
index (fresh salted data each iteration), timed with a VALUE fetch as the
completion fence; per-frame = (T(F2) - T(F1))/(F2 - F1), which cancels
the per-call round trip. Three measurement hazards found (and fixed)
here, all tunnel-specific: (1) a fixed-seed jitter replays byte-identical
(program, args) pairs across processes into the tunnel's memoization;
(2) a constant (all-NaN) result gives the runtime a value-independent
answer to serve; (3) block_until_ready is intermittently lazy — only a
D2H fetch always materializes. Measured honest rate on v5e:
13.59 ms/frame -> 73.6 frames/s for the full chain at production shapes.

Usage: python scripts/benchmarks/preproc_bench.py [--frames 50] [--points 131072]
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
    ap.add_argument("--frames", type=int, default=50,
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
        # nan-safe, input-DEPENDENT reduction. Empty elevation cells are
        # NaN by contract (ops/elevation.py), so a plain sum is NaN for
        # EVERY input — a bit-identical constant result that a caching
        # tunnel runtime can serve without executing anything (this bench
        # printed 0.09 ms "reps" for a 13.6 ms/frame chain that way).
        return (dense.sum()
                + sum(jnp.nansum(v) for v in elev.values()))

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(points0, n):
        def body(carry, i):
            pts = points0 + (i.astype(jnp.float32) * 1e-4)[None, None]
            return carry + frame_chain(pts), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return out

    # The jitter rng must be non-deterministic: the tunnel memoization
    # persists ACROSS PROCESSES, so a seed-0 jitter sequence replays the
    # exact (program, args) pairs of every previous invocation and times
    # nothing but cache hits (this script printed -0.0 ms/frame for a
    # measured 13.6 ms/frame chain until this seed). `base` stays seeded
    # for comparability; only the per-call jitter is salted.
    import os as _os
    import time as _time

    jrng = np.random.default_rng(_os.getpid() ^ _time.time_ns())

    def fresh():
        # a FRESH device-put input per timed call: a tunnel-attached
        # runtime memoizes (program, args), so re-executing on the same
        # buffer would time cache hits (runtime/benchmark.py discipline)
        jitter = jrng.uniform(-1e-3, 1e-3, base.shape).astype(np.float32)
        x = jax.device_put(jnp.asarray(base + jitter))
        jax.block_until_ready(x)
        return x

    import sys

    def timed(n, reps=5):
        float(run(fresh(), n))  # compile + drain
        ts = []
        for _ in range(reps):
            x = fresh()
            t0 = time.perf_counter()
            # Fence on the VALUE, not block_until_ready: the tunnel
            # runtime is intermittently lazy — block_until_ready was
            # observed returning in 0.09 ms for a chain whose value-fetch
            # measures 13.6 ms/frame (same program, same minute). A D2H
            # fetch always materializes; its round-trip cost cancels in
            # the scan-length difference below.
            float(run(x, n))
            ts.append(time.perf_counter() - t0)
        print(f"# n={n} reps_ms={[round(t * 1e3, 2) for t in ts]}",
              file=sys.stderr)
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
