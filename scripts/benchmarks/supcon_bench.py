"""SupCon phase attribution at the production stage-2 shape.

ssc_breakdown (round 5) measured SupPixelConLoss at ~65 ms of the 419 ms
bf16 B=16 step — the largest single removable line item. This tool splits
the loss body over N = B*H*W = 1M pixels:

  lexsort       jnp.lexsort of (priority, label) over N
  sort_gather   lexsort + the two [N] gathers through the order
  kth_select    _kth_smallest_positive binary search (round-5 median)
  median_sort   the retired full-N-sort median path, for comparison
  compact       the 1M-update slot-compaction scatter alone (synthetic
                keep mask — the stream-compaction cost floor)
  compact_topk  candidate replacement: top_k on a keep-score + M-gather
  sample_full   capped_class_sample end-to-end
  gather_loss   feature gather + multi_pos_con_loss at M=max_samples
  supcon_e2e    the whole loss body (sample + gather + loss)
  supcon_grad   d(loss)/d(feats) through the whole body

Timing is scan-difference (runtime/benchmark.py method): the per-call
tunnel RPC (~25-40 ms) swamps ms-scale phases — a first cut of this tool
timed single calls and every cheap probe read ~25 ms of pure RPC floor.
Iterations are serialized inside ONE jitted program by feeding each
step's scalar output into the next step's PRNG fold, and per-iteration
cost is the difference between a long and a length-1 scan. Large arrays
are explicit jit ARGUMENTS, not closures: a closed-over [N,Z] f32
feature array is baked into the serialized HLO as a 268 MB constant and
exceeds the tunnel's remote_compile payload limit (HTTP 413 — the 5th
measurement hazard).

Reference sampling semantics: creste/utils/loss_utils.py:203-286
(per-class cap at min(median class count, 1000) random samples).

Usage: python scripts/benchmarks/supcon_bench.py [--batch 16] [--hw 256]
       [--iters 10] [--max-samples 2048]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
import argparse
import json
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--max-samples", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import (
        enable_compile_cache,
        ensure_env_platform,
    )

    ensure_env_platform()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from creste_public_tpu.losses.supcon import (
        _kth_smallest_positive,
        capped_class_sample,
        multi_pos_con_loss,
        remap_labels_per_batch,
    )

    B, HW, Z, M = args.batch, args.hw, args.feat, args.max_samples
    N = B * HW * HW
    rng = np.random.default_rng(0)
    # SAM-instance-like labels: ~40 instances/image, blocky regions
    lab_img = rng.integers(0, 40, size=(B, HW // 8, HW // 8), dtype=np.int32)
    labels_np = np.repeat(np.repeat(lab_img, 8, axis=1), 8, axis=2)
    valid_np = rng.random((B, HW, HW)) < 0.5  # ~FOV fraction

    labels = remap_labels_per_batch(jnp.asarray(labels_np), ignore_idx=0)
    flat_labels = labels.reshape(-1)
    flat_valid = jnp.asarray(valid_np).reshape(-1)
    feats = jnp.asarray(rng.standard_normal((N, Z), dtype=np.float32))

    def salt_key(i):
        return jax.random.PRNGKey(
            int((i * 1009 + _os.getpid() ^ time.time_ns()) % (2 ** 31)))

    # ---- probes: (lab, key, *extra) -> scalar ----
    def f_lexsort(lab, key):
        pri = jax.random.uniform(key, (N,))
        big = jnp.asarray(2 ** 30, lab.dtype)
        kl = jnp.where(flat_valid, lab, big)
        return jnp.lexsort((pri, kl))[0]

    def f_sort_gather(lab, key):
        pri = jax.random.uniform(key, (N,))
        big = jnp.asarray(2 ** 30, lab.dtype)
        kl = jnp.where(flat_valid, lab, big)
        order = jnp.lexsort((pri, kl))
        return kl[order][0] + flat_valid[order][-1]

    def f_median_sort(lab, key):
        sizes = lab.astype(jnp.int32) % 977 + jax.random.randint(
            key, (N,), 0, 3)
        return jnp.sort(sizes)[N // 2]

    def f_kth_select(lab, key):
        sizes = lab.astype(jnp.int32) % 977 + jax.random.randint(
            key, (N,), 0, 3)
        return _kth_smallest_positive(sizes, jnp.asarray(N // 4), N)

    def f_compact(lab, key):
        # stream-compaction floor: cumsum + two 1M-update scatters into M
        # slots (the tail of capped_class_sample), keep mask synthetic
        keep = (lab % 17 < 2) & flat_valid
        keep_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slot = jnp.where(keep, keep_rank, M)
        src = jax.random.randint(key, (N,), 0, N, jnp.int32)
        idx_out = jnp.zeros((M,), jnp.int32).at[slot].set(src, mode="drop")
        val_out = jnp.zeros((M,), bool).at[slot].set(keep, mode="drop")
        return idx_out.sum() + val_out.sum()

    def f_compact_topk(lab, key):
        # candidate replacement for the scatter compaction: top_k on a
        # keep-score (kept elements get descending N-pos, so the top M
        # come out in ascending position order), then an M-sized gather
        keep = (lab % 17 < 2) & flat_valid
        src = jax.random.randint(key, (N,), 0, N, jnp.int32)
        score = jnp.where(keep, N - jnp.arange(N, dtype=jnp.int32), 0)
        top, ti = jax.lax.top_k(score, M)
        idx_out = jnp.where(top > 0, src[ti], 0)
        return idx_out.sum() + (top > 0).sum()

    def f_sample(lab, key):
        idx, sel = capped_class_sample(lab, flat_valid, M, cap=1000, rng=key)
        return idx.sum() + sel.sum()

    def f_gather_loss(lab, key, f_all):
        idx = jax.random.randint(key, (M,), 0, N)
        return multi_pos_con_loss(f_all[idx], lab[idx], jnp.ones((M,), bool))

    def f_e2e(lab, key, f_all):
        idx, sel = capped_class_sample(lab, flat_valid, M, cap=1000, rng=key)
        return multi_pos_con_loss(f_all[idx], lab[idx], sel)

    def f_e2e_grad(lab, key, f_all):
        def loss_of(f):
            idx, sel = capped_class_sample(
                lab, flat_valid, M, cap=1000, rng=key)
            return multi_pos_con_loss(f[idx], lab[idx], sel)

        return jax.grad(loss_of)(f_all).sum()

    # ---- scan-difference timing ----
    def scan_ms(f, extra, n_long, repeats):
        @partial(jax.jit, static_argnames=("n",))
        def loop(lab, key, n, *ex):
            def body(s_prev, i):
                k = jax.random.fold_in(
                    key, i * 2 + (s_prev.astype(jnp.int32) & 1))
                out = f(lab, k, *ex)
                return jnp.asarray(out, jnp.float32).reshape(-1)[0], None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return s

        med = {}
        for n in (1, n_long):
            float(loop(flat_labels, salt_key(n), n, *extra))  # compile
            ts = []
            for r in range(repeats):
                k = salt_key(1000 + 7 * n + r)
                t0 = time.perf_counter()
                float(loop(flat_labels, k, n, *extra))  # D2H value fence
                ts.append(time.perf_counter() - t0)
            med[n] = float(np.median(ts))
        return (med[n_long] - med[1]) / (n_long - 1) * 1e3

    phases = [
        ("lexsort_ms", f_lexsort, ()),
        ("sort_gather_ms", f_sort_gather, ()),
        ("median_sort_ms", f_median_sort, ()),
        ("kth_select_ms", f_kth_select, ()),
        ("compact_ms", f_compact, ()),
        ("compact_topk_ms", f_compact_topk, ()),
        ("sample_full_ms", f_sample, ()),
        ("gather_loss_ms", f_gather_loss, (feats,)),
        ("supcon_e2e_ms", f_e2e, (feats,)),
        ("supcon_grad_ms", f_e2e_grad, (feats,)),
    ]
    print(f"# supcon breakdown  N={N} M={M} (scan-difference, "
          f"iters={args.iters})")
    out = {"N": N, "M": M, "iters": args.iters}
    for name, fn, extra in phases:
        out[name] = round(scan_ms(fn, extra, args.iters, args.repeats), 3)
        print(f"{name:>16}: {out[name]:8.2f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
