"""SupCon phase attribution at the production stage-2 shape.

ssc_breakdown (round 5) measured SupPixelConLoss at ~65 ms of the 419 ms
bf16 B=16 step — the largest single removable line item — and its cost is
almost all *forward* (losses_fwd 77 ms vs distill 4.5 ms), i.e. the
sampling machinery, not the [M,M] contrastive matmul. This tool splits it:

  lexsort       jnp.lexsort of (priority, label) over N = B*H*W
  median_sort   a full jnp.sort of the class-size array (the pre-round-5
                median path, retired for the binary-search selection)
  kth_select    _kth_smallest_positive binary search (the replacement)
  sample_full   capped_class_sample end-to-end
  gather_loss   feature gather + multi_pos_con_loss at M=max_samples
  supcon_e2e    the whole loss body (sample + gather + loss)

All phases timed with fresh salted inputs and a value fence
(runtime/benchmark.py hazards: the axon tunnel memoizes (program, args)
across processes and block_until_ready is intermittently lazy).

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
import time

import numpy as np

_SALT = np.float32(((_os.getpid() ^ time.time_ns()) % 997) * 1e-7)


def _fence(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.ravel(np.asarray(leaf))[0])


def timed(fn, make_args, iters, *const_args):
    """const_args are passed as explicit jit arguments (NOT closed over):
    a closed-over [N,Z] feature array is baked into the serialized HLO as
    a constant, and at N=1M, Z=64 the 268 MB payload exceeds the axon
    tunnel's remote_compile request limit (HTTP 413 — 5th measurement
    hazard)."""
    fn(*make_args(0), *const_args)
    ts = []
    for i in range(1, iters + 1):
        a = make_args(i)
        t0 = time.perf_counter()
        _fence(fn(*a, *const_args))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--max-samples", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
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
    feats = jnp.asarray(
        rng.standard_normal((N, Z), dtype=np.float32))

    def salt_key(i):
        return jax.random.PRNGKey(
            int((i * 1009 + _os.getpid() ^ time.time_ns()) % (2 ** 31)))

    @jax.jit
    def f_lexsort(lab, key):
        pri = jax.random.uniform(key, (N,))
        big = jnp.asarray(2 ** 30, lab.dtype)
        kl = jnp.where(flat_valid, lab, big)
        return jnp.lexsort((pri, kl))[0]

    @jax.jit
    def f_median_sort(lab, key):
        sizes = lab.astype(jnp.int32) + jax.random.randint(
            key, (N,), 0, 3)  # stand-in per-element sizes array
        return jnp.sort(sizes)[N // 2]

    @jax.jit
    def f_kth_select(lab, key):
        from creste_public_tpu.losses.supcon import _kth_smallest_positive

        sizes = lab.astype(jnp.int32) % 977 + jax.random.randint(
            key, (N,), 0, 3)
        return _kth_smallest_positive(sizes, jnp.asarray(N // 4), N)

    @jax.jit
    def f_sample(lab, key):
        idx, sel = capped_class_sample(lab, flat_valid, M, cap=1000, rng=key)
        return idx.sum() + sel.sum()

    @jax.jit
    def f_gather_loss(lab, key, f_all):
        idx = jax.random.randint(key, (M,), 0, N)
        f = f_all[idx]
        l = lab[idx]
        return multi_pos_con_loss(f, l, jnp.ones((M,), bool))

    @jax.jit
    def f_e2e(lab, key, f_all):
        idx, sel = capped_class_sample(lab, flat_valid, M, cap=1000, rng=key)
        return multi_pos_con_loss(f_all[idx], lab[idx], sel)

    @jax.jit
    def f_e2e_grad(lab, key, f_all):
        def loss_of(f):
            idx, sel = capped_class_sample(
                lab, flat_valid, M, cap=1000, rng=key)
            return multi_pos_con_loss(f[idx], lab[idx], sel)

        return jax.grad(loss_of)(f_all).sum()

    mk = lambda i: (flat_labels + jnp.int32(i % 3), salt_key(i))
    phases = [
        ("lexsort_ms", f_lexsort, ()),
        ("median_sort_ms", f_median_sort, ()),
        ("kth_select_ms", f_kth_select, ()),
        ("sample_full_ms", f_sample, ()),
        ("gather_loss_ms", f_gather_loss, (feats,)),
        ("supcon_e2e_ms", f_e2e, (feats,)),
        ("supcon_grad_ms", f_e2e_grad, (feats,)),
    ]
    print(f"# supcon breakdown  N={N} M={M}")
    out = {"N": N, "M": M}
    for name, fn, extra in phases:
        out[name] = timed(fn, mk, args.iters, *extra)
        print(f"{name:>16}: {out[name]:8.2f}", flush=True)


if __name__ == "__main__":
    main()
