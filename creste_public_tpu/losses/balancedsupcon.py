"""Balanced supervised contrastive loss (l_spread variant).

Parity target: creste/models/losses/balancedsupcon_loss.py:32-143
(BalContrastiveLoss): anchor-vs-anchor supervised term `lsup` whose
denominator contains only negatives (pos_in_denom=False), plus the spread
term `lspread` comparing anchors against their augmented views normalised
by the positive-pair logsumexp; combined as
(a_lc*lsup + a_spread*lspread) / (a_lc + a_spread). ``type`` presets map to
coefficient settings exactly like the reference ('sup_con' -> a_spread=0,
'l_repel' -> a_lc=0, 'sim_clr' -> unsupervised).

JAX redesign: identical math on static shapes with a validity mask instead
of early-returning on tiny batches (loss contributes 0 when < 2 valid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bal_contrastive_loss(
    feats: Array,
    labels: Array,
    temperature: float = 0.5,
    a_lc: float = 1.0,
    a_spread: float = 1.0,
    loss_type: str = "l_spread",
    valid: Array | None = None,
) -> Array:
    """
    Args:
      feats: [B, V, Z] multi-view features (view 0 = anchor).
      labels: [B] int labels.
      valid: optional [B] bool sample mask.
    """
    if loss_type == "sup_con":
        a_spread = 0.0
    elif loss_type == "l_repel":
        a_lc, a_spread = 0.0, 1.0
    elif loss_type == "sim_clr":
        a_spread = 0.0
        labels = jnp.arange(feats.shape[0])  # every sample its own class

    B, V, Z = feats.shape
    if valid is None:
        valid = jnp.ones((B,), bool)
    anchor = feats[:, 0]
    augment = anchor if V == 1 else feats[:, 1:].transpose(1, 0, 2).reshape(
        B * (V - 1), Z
    )

    logits = anchor @ anchor.T / temperature
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)
    )
    exp_logits = jnp.exp(logits)

    eye = jnp.eye(B, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :]
    posmask = (labels[:, None] == labels[None, :]) & ~eye & pair_valid
    negmask = ~(labels[:, None] == labels[None, :]) & ~eye & pair_valid

    # lsup: denominator = own exp + sum of negatives; rows with no positive
    # contribute 0 but stay in the mean denominator (reference
    # mean_log_prob_pos.view(B,1).mean(), balancedsupcon_loss.py:119-124)
    o_neg = jnp.sum(exp_logits * negmask, axis=1, keepdims=True)
    log_prob = logits - jnp.log(exp_logits + o_neg + 1e-12)
    n_pos = jnp.maximum(posmask.sum(1), 1)
    mean_log_prob_pos = (log_prob * posmask).sum(1) / n_pos
    row_ok = valid & (posmask.sum(1) > 0)
    lsup = -jnp.sum(mean_log_prob_pos * row_ok) / jnp.maximum(
        valid.sum(), 1
    )

    # lspread (balancedsupcon_loss.py:126-139), reproduced EXACTLY as the
    # reference executes it, including two quirks pinned by
    # tests/test_reference_exec.py::test_reference_bal_contrastive_loss:
    #   (a) augment columns are view-major (cat of unbind) but the augmask
    #       indexes sample-major ((j // (V-1)) % B) — anchor b is paired
    #       with view-1 features of samples (b(V-1))%B, (b(V-1)+1)%B, ...;
    #   (b) the normalizer is logsumexp over logits*posmask — zeroed
    #       non-positive entries still contribute exp(0) to the LSE.
    if V > 1:
        auglogits = anchor @ augment.T / temperature
        auglogits = auglogits - jax.lax.stop_gradient(
            jnp.max(auglogits, axis=1, keepdims=True)
        )
        cols = B * (V - 1)
        mask_owner = (jnp.arange(cols) // (V - 1)) % B
        augmask = mask_owner[None, :] == jnp.arange(B)[:, None]
        col_valid = valid[jnp.arange(cols) % B]  # actual view-major owner
        augmask = augmask & col_valid[None, :]
        pos_lse = jax.nn.logsumexp(logits * posmask, axis=1, keepdims=True)
        log_prob_sp = (auglogits - pos_lse) * augmask * valid[:, None]
        lspread = -jnp.sum(log_prob_sp) / jnp.maximum(valid.sum(), 1)
    else:
        lspread = jnp.float32(0.0)

    denom = a_lc + a_spread
    assert denom != 0
    return (a_lc * lsup + a_spread * lspread) / denom
