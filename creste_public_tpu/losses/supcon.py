"""Supervised pixel-contrastive losses (multi-positive, cross-device).

Parity targets:
  - MultiPosConLoss: creste/models/losses/supcon_loss.py:56-116 — L2-norm
    features, gradient-flowing all_gather of features across data-parallel
    ranks, label-equality positive mask, self-exclusion, stabilised logits,
    soft cross-entropy against the normalised positive distribution with
    optional per-class weights.
  - SupPixelConLoss sampling: creste/utils/loss_utils.py:203-286 — valid
    (non-ignore, in-FOV) pixels, per-batch label remap, per-class cap at
    min(median class count, 1000) random samples.

TPU-first redesign (SURVEY §7 "hard parts" #2): the reference's
data-dependent sample count becomes a *static* sample budget ``max_samples``
with validity masks. Per-class capping keeps the reference's K =
min(median, cap) as a traced value used only in masks, never in shapes. The
cross-rank gather is `jax.lax.all_gather` over the named data axis
(differentiable by construction), applied when the loss runs inside
pjit/shard_map with that axis present.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def remap_labels_per_batch(labels: Array, ignore_idx: int = 0) -> Array:
    """Make instance labels distinct across batch elements.

    The reference compacts per-image labels and offsets by the running count
    (utils.py:59-80); for the equality comparisons the loss makes, offsetting
    each batch row by ``b * L`` (L = max label + 1, static) is equivalent.
    ``ignore_idx`` rows stay at ignore everywhere.
    """
    B = labels.shape[0]
    L = jnp.asarray(2 ** 20, labels.dtype)  # larger than any instance count
    offsets = (jnp.arange(B, dtype=labels.dtype) * L).reshape(
        (B,) + (1,) * (labels.ndim - 1)
    )
    out = labels + offsets
    return jnp.where(labels == ignore_idx, ignore_idx, out)


def _kth_smallest_positive(values: Array, k: Array, upper: int) -> Array:
    """k-th smallest (0-based) of the positive entries of ``values``.

    Exact selection by binary search on the value range [1, upper]: the
    answer is the smallest v with count(0 < values <= v) >= k+1. Each of
    the ceil(log2(upper)) iterations is one masked reduction — O(N log U)
    bandwidth-light work replacing an O(N log^2 N) full sort when only one
    order statistic is needed. Caller guarantees at least k+1 positive
    entries.
    """
    pos = values > 0

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        cnt = jnp.sum((pos & (values <= mid)).astype(jnp.int32))
        take_left = cnt >= k + 1
        return (jnp.where(take_left, lo, mid + 1),
                jnp.where(take_left, mid, hi))

    steps = max(1, int(upper).bit_length())
    lo, _ = jax.lax.fori_loop(
        0, steps,
        body,
        (jnp.asarray(1, values.dtype), jnp.asarray(upper, values.dtype)),
    )
    return lo


def capped_class_sample(
    labels: Array,
    valid: Array,
    max_samples: int,
    cap: int = 1000,
    rng: Array | None = None,
    use_median: bool = True,
) -> tuple[Array, Array]:
    """Select up to min(median class count, cap) elements per class.

    Args:
      labels: [N] int labels (already remapped; ignore elements must have
        valid=False).
      valid: [N] bool.
      max_samples: static output size M.
      cap: per-class hard cap (reference: 1000).
      rng: PRNG key for random within-class selection (None -> deterministic).
      use_median: when False, skip the median-class-count clamp and cap each
        class at ``cap`` alone (the VicregLoss sampling regime,
        loss_utils.py:806-818, vs SupCon's min(median, cap), 276-283).

    Returns:
      idx: [M] int32 indices into the flat arrays.
      sel_valid: [M] bool slot-validity mask.
    """
    N = labels.shape[0]
    if rng is None:
        pri = jnp.zeros((N,), jnp.float32)
    else:
        pri = jax.random.uniform(rng, (N,))

    # Sort by (invalid-last, label, random priority) via one multi-operand
    # lax.sort carrying the index payload. supcon_bench (round 5, real
    # chip) measured the 1M-element sort itself at ~1.6 ms but the two
    # post-sort gathers `key_label[order]` / `valid[order]` at ~19 ms —
    # random 1M-gathers are update-serialization-bound like the splat
    # scatter. The sorted keys come out of the sort for free, and
    # validity is recovered by comparing against the sentinel (valid
    # labels are < 2^30: remap_labels_per_batch emits b*2^20 + instance).
    big = jnp.asarray(2 ** 30, labels.dtype)
    key_label = jnp.where(valid, labels, big)
    sorted_labels, _, order = jax.lax.sort(
        (key_label, pri, jnp.arange(N, dtype=jnp.int32)),
        num_keys=2, is_stable=True,
    )
    sorted_valid = sorted_labels != big

    # Rank within class: position - first index of this label value.
    pos = jnp.arange(N)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_labels[1:] != sorted_labels[:-1]]
    )
    # index of the most recent "first" at or before each position
    first_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, pos, -1)
    )
    rank = pos - first_pos

    # Class counts (for the median): count = segment sizes on sorted labels.
    # Compute per-element class size, then take sizes at "first" positions.
    seg_start = first_pos
    # last position of each segment: scan from the right
    rev_is_last = jnp.concatenate(
        [sorted_labels[:-1] != sorted_labels[1:], jnp.ones((1,), bool)]
    )
    last_pos = jax.lax.associative_scan(
        jnp.minimum, jnp.where(rev_is_last, pos, N), reverse=True
    )
    sizes = last_pos - seg_start + 1  # per element: its class's count

    # median of nonzero class counts over distinct valid classes
    class_sizes = jnp.where(is_first & sorted_valid, sizes, 0)
    n_classes = jnp.sum((class_sizes > 0).astype(jnp.int32))
    # emulate torch .median() (lower median) on the nonzero counts.
    # k-th smallest via binary search on the value range (sizes are in
    # [1, N]): ~log2(N) masked reductions instead of a second full N-sort
    # (the sort was ~half the sampling cost at the production 1M-pixel
    # stage-2 shape; the reduction chain is bandwidth-trivial).
    med_idx = jnp.where(n_classes % 2 == 0, jnp.maximum(n_classes // 2 - 1, 0),
                        n_classes // 2)
    median = jnp.where(
        n_classes > 0, _kth_smallest_positive(class_sizes, med_idx, N), 0
    )
    k = jnp.minimum(median, cap) if use_median else jnp.asarray(cap)

    keep = sorted_valid & (rank < k)
    # Choose the first max_samples kept elements (they're class-sorted)
    # by top_k on a keep score: kept elements get distinct descending
    # scores in position order, so the top M come out exactly in slot
    # order. supcon_bench (real chip): 1.56 ms vs 11.6 ms for the
    # equivalent cumsum + 1M-update slot-compaction scatters — stream
    # compaction via a full-N scatter is update-serialization-bound.
    m_eff = min(max_samples, N)
    score = jnp.where(keep, N - pos, 0)
    top, ti = jax.lax.top_k(score, m_eff)
    idx_out = jnp.where(top > 0, order[ti], 0)
    n_kept = jnp.sum(keep.astype(jnp.int32))
    valid_out = jnp.arange(m_eff) < n_kept
    if m_eff < max_samples:
        pad = max_samples - m_eff
        idx_out = jnp.concatenate([idx_out, jnp.zeros((pad,), jnp.int32)])
        valid_out = jnp.concatenate([valid_out, jnp.zeros((pad,), bool)])
    return idx_out, valid_out


def multi_pos_con_loss(
    feats: Array,
    labels: Array,
    valid: Array,
    temperature: float = 0.1,
    class_weights: Array | None = None,
    axis_name: str | None = None,
) -> Array:
    """Multi-positive contrastive loss over (possibly cross-device) features.

    Args:
      feats: [M, Z] local features (masked slots arbitrary).
      labels: [M] local labels.
      valid: [M] slot validity.
      temperature: softmax temperature.
      class_weights: optional [C] weights indexed by raw label id.
      axis_name: data-parallel axis to all_gather over (None = single device).
    """
    # rsqrt(sumsq + eps) instead of /(norm + eps): d|x| at x=0 is NaN and
    # would poison grads whenever a feature vector is exactly zero (e.g.
    # empty BEV cells early in training).
    feats = feats * jax.lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12
    )
    M = feats.shape[0]

    if axis_name is not None:
        all_feats = jax.lax.all_gather(feats, axis_name)  # [D, M, Z]
        all_labels = jax.lax.all_gather(jax.lax.stop_gradient(labels), axis_name)
        all_valid = jax.lax.all_gather(valid, axis_name)
        D = all_feats.shape[0]
        rank = jax.lax.axis_index(axis_name)
        all_feats = all_feats.reshape(D * M, -1)
        all_labels = all_labels.reshape(D * M)
        all_valid = all_valid.reshape(D * M)
    else:
        all_feats, all_labels, all_valid = feats, labels, valid
        rank = 0
        D = 1

    # positive mask on label equality; self-exclusion at the diagonal block
    mask = (labels[:, None] == all_labels[None, :]).astype(jnp.float32)
    self_idx = jnp.arange(M) + rank * M
    logits_mask = jnp.ones((M, D * M if axis_name is not None else M))
    logits_mask = logits_mask.at[jnp.arange(M), self_idx].set(0.0)
    pair_valid = valid[:, None] & all_valid[None, :]
    mask = mask * logits_mask * pair_valid

    logits = feats @ all_feats.T / temperature
    logits = logits - (1.0 - logits_mask) * 1e9
    logits = logits - (~pair_valid) * 1e9
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)
    )

    p = mask / jnp.clip(mask.sum(-1, keepdims=True), 1.0, None)
    logq = jax.nn.log_softmax(logits, axis=-1)
    per_anchor = jnp.sum(p * logq, axis=-1)

    if class_weights is not None:
        w = class_weights[jnp.clip(labels, 0, class_weights.shape[0] - 1)]
        per_anchor = per_anchor * w

    per_anchor = per_anchor * valid
    n = jnp.clip(valid.sum(), 1.0, None)
    return -per_anchor.sum() / n
