"""Splat-scatter micro-benchmark: B=1 vs B=N, and scatter reformulations.

VERDICT r4 #1: the B=8 serving graph delivers FEWER frames/s than B=1
while its analytic bytes/frame DROP (weights amortize) — so the batched
graph is not bandwidth-bound; something serializes. The bilinear splat
scatter (ops/splat.py) is the one op whose cost is per-update rather than
per-byte: 4P=156k updates x 97 channels per frame, scaling linearly with
batch while the convs get better MXU utilisation. This tool times the
splat alone at production shape (P=2*128*153 points, 96+1 channels,
256x256 grid) across batch sizes and against candidate reformulations:

  batched   the production path: acc[B,V,F+1].at[b_ix, idx].add(...)
  flat      single flat index space: acc[(B*V),F+1].at[flat_idx].add(...)
  sorted    argsort keys + gather updates + segment_sum(sorted=True)
  unique_hint  flat scatter with unique_indices=True — WRONG numerics
            (collisions overwrite), measured only as the scatter-hardware
            speed-of-light reference for the same update stream

Reference anchor: splat_soft creste/models/blocks/splat_projection.py:262.

Usage: python scripts/benchmarks/splat_bench.py [--batches 1,8]
       [--iters 30]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--points", type=int, default=2 * 128 * 153)
    ap.add_argument("--feats", type=int, default=96)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset to time (default: all)")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import (
        enable_compile_cache,
        ensure_env_platform,
    )

    ensure_env_platform()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from creste_public_tpu.ops.splat import splat_bilinear

    H = W = args.grid
    P, F = args.points, args.feats
    n_vox = H * W
    rng = np.random.default_rng(_os.getpid() ^ time.time_ns())

    def fresh(B):
        xy = rng.uniform(-2, W + 2, (B, P, 2)).astype(np.float32)
        feats = rng.normal(size=(B, P, F)).astype(np.float32)
        d = jax.device_put((jnp.asarray(xy), jnp.asarray(feats)))
        jax.block_until_ready(d)
        return d

    # ---- candidate reformulations (numerics-equal unless noted) ----
    def _corners(xy):
        xy = xy.astype(jnp.float32)
        xy0 = jnp.floor(xy)
        r = xy - xy0
        x0 = xy0[..., 0].astype(jnp.int32)
        y0 = xy0[..., 1].astype(jnp.int32)
        idxs, ws = [], []
        for xd in (0, 1):
            x_ = x0 + xd
            wx = (1 - xd) + (2 * xd - 1) * r[..., 0]
            for yd in (0, 1):
                y_ = y0 + yd
                wy = (1 - yd) + (2 * yd - 1) * r[..., 1]
                w = wx * wy
                valid = (x_ >= 0) & (x_ < W) & (y_ >= 0) & (y_ < H)
                idxs.append(jnp.where(valid, y_ * W + x_, 0))
                ws.append(jnp.where(valid, w, 0.0))
        return jnp.concatenate(idxs, 1), jnp.concatenate(ws, 1)

    def splat_flat(xy, feats):
        B = feats.shape[0]
        idx4, w4 = _corners(xy)
        feats4 = jnp.tile(feats.astype(jnp.float32), (1, 4, 1))
        upd = jnp.concatenate([w4[..., None] * feats4, w4[..., None]], -1)
        flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * n_vox
                    + idx4).reshape(-1)
        acc = jnp.zeros((B * n_vox, F + 1), jnp.float32)
        acc = acc.at[flat_idx].add(upd.reshape(B * 4 * P, F + 1),
                                   mode="drop")
        return acc.reshape(B, n_vox, F + 1)

    def splat_sorted(xy, feats):
        B = feats.shape[0]
        idx4, w4 = _corners(xy)
        feats4 = jnp.tile(feats.astype(jnp.float32), (1, 4, 1))
        upd = jnp.concatenate([w4[..., None] * feats4, w4[..., None]], -1)
        flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * n_vox
                    + idx4).reshape(-1)
        order = jnp.argsort(flat_idx)
        keys = flat_idx[order]
        upd_s = upd.reshape(B * 4 * P, F + 1)[order]  # gather, not scatter
        acc = jax.ops.segment_sum(upd_s, keys, num_segments=B * n_vox,
                                  indices_are_sorted=True)
        return acc.reshape(B, n_vox, F + 1)

    def splat_unique_hint(xy, feats):
        # NOT numerics-correct (collisions overwrite) — hardware
        # speed-of-light for the same update stream
        B = feats.shape[0]
        idx4, w4 = _corners(xy)
        feats4 = jnp.tile(feats.astype(jnp.float32), (1, 4, 1))
        upd = jnp.concatenate([w4[..., None] * feats4, w4[..., None]], -1)
        flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * n_vox
                    + idx4).reshape(-1)
        acc = jnp.zeros((B * n_vox, F + 1), jnp.float32)
        acc = acc.at[flat_idx].add(upd.reshape(B * 4 * P, F + 1),
                                   mode="drop", unique_indices=True)
        return acc.reshape(B, n_vox, F + 1)

    def splat_bf16_acc(xy, feats):
        # bf16 update stream AND bf16 accumulator: if the scatter is
        # read-modify-write byte-paced, halving the row bytes halves the
        # time. NOT parity-exact (the accumulator loses mantissa under
        # collisions) — candidate for the opt-in bf16 stream mode only.
        B = feats.shape[0]
        idx4, w4 = _corners(xy)
        f16 = feats.astype(jnp.bfloat16)
        w16 = w4.astype(jnp.bfloat16)
        feats4 = jnp.tile(f16, (1, 4, 1))
        upd = jnp.concatenate([w16[..., None] * feats4, w16[..., None]], -1)
        acc = jnp.zeros((B, n_vox, F + 1), jnp.bfloat16)
        acc = acc.at[jnp.arange(B)[:, None], idx4].add(upd, mode="drop")
        return acc

    variants = {
        "batched": lambda xy, f: splat_bilinear(
            xy, f, (H, W), mode="mean")[0],
        "flat": splat_flat,
        "sorted": splat_sorted,
        "unique_hint": splat_unique_hint,
        "bf16_acc": splat_bf16_acc,
    }

    # numerics check (CPU-cheap shapes suffice on any backend)
    xy0, f0 = fresh(2)
    ref = None
    for name in ("batched", "flat", "sorted"):
        out = np.asarray(jax.jit(variants[name])(xy0, f0))
        if name == "batched":
            # production path returns features only; rebuild acc layout
            dens = np.asarray(jax.jit(
                lambda xy, f: splat_bilinear(xy, f, (H, W), "mean")[1]
            )(xy0, f0))
            ref = np.concatenate(
                [out * np.clip(dens, 1.0, None)[..., None],
                 dens[..., None]], -1)
        else:
            dev = float(np.max(np.abs(out.reshape(ref.shape) - ref)))
            print(f"numerics {name} vs batched: max|Δ| = {dev:.2e}",
                  flush=True)
            assert dev < 2e-2, f"{name} diverges"
    out16 = np.asarray(jax.jit(variants["bf16_acc"])(xy0, f0),
                       dtype=np.float32)
    rs = float(np.max(np.abs(ref))) or 1.0
    dev16 = float(np.max(np.abs(out16.reshape(ref.shape) - ref)))
    print(f"numerics bf16_acc vs batched: max|Δ| = {dev16:.2e} "
          f"(rel {dev16 / rs:.2e}; opt-in, not parity-exact)", flush=True)

    # scan-difference timing (runtime/benchmark.py method): the per-call
    # tunnel RPC (~30-45 ms) swamps a ms-scale op, and the runtime
    # memoizes + is intermittently lazy — serialize iterations via output
    # feedback through the FEATURES (keeping the voxel-index distribution
    # realistic) and difference scan lengths.
    from functools import partial

    def scan_ms_per_frame(f, B, n_long=args.iters, repeats=3):
        @partial(jax.jit, static_argnames=("n",))
        def loop(xy, feats, n):
            def body(carry, _):
                ft, acc = carry
                out = f(xy, ft)
                s = out.reshape(-1)[-1] + out.reshape(-1)[0]
                return (ft + s * 1e-12, acc + s), None

            (_, acc), _ = jax.lax.scan(
                body, (feats, jnp.float32(0)), None, length=n)
            return acc

        med = {}
        for n in (1, n_long):
            float(loop(*fresh(B), n))  # compile + drain
            ts = []
            for _ in range(repeats):
                a = fresh(B)
                t0 = time.perf_counter()
                float(loop(*a, n))  # D2H value fence
                ts.append(time.perf_counter() - t0)
            med[n] = float(np.median(ts))
        return (med[n_long] - med[1]) / (n_long - 1) * 1e3 / B

    line = {"metric": "splat scatter ms/frame", "points": P, "feats": F}
    timed_variants = variants
    if args.variants:
        keep = set(args.variants.split(","))
        timed_variants = {k: v for k, v in variants.items() if k in keep}
    for B in [int(b) for b in args.batches.split(",")]:
        for name, f in timed_variants.items():
            ms = scan_ms_per_frame(f, B)
            line[f"{name}_B{B}_ms_per_frame"] = round(ms, 3)
            print(f"B={B:2d} {name:12s}: {ms:8.3f} ms/frame", flush=True)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
