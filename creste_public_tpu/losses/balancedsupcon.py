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
        # the reference's sim_clr preset sets use_labels=False but its
        # forward never reads the flag — it computes lsup with the REAL
        # labels (identical to sup_con); relabelling every sample as its
        # own class here would zero the loss entirely
        a_lc, a_spread = 1.0, 0.0

    B, V, Z = feats.shape
    if valid is None:
        valid = jnp.ones((B,), bool)
    else:
        # Front-pack valid rows (stable): the reference's l_spread pairing
        # pattern depends on the TRUE batch size (its view-major column
        # layout wraps at B), so exact parity under static padding requires
        # the valid rows contiguous at the front and the pairing computed
        # against the dynamic valid count below.
        order = jnp.argsort(~valid, stable=True)
        feats = feats[order]
        labels = labels[order]
        valid = valid[order]
    anchor = feats[:, 0]

    logits = anchor @ anchor.T / temperature
    # stability max over VALID columns only: the shift cancels inside lsup
    # but NOT in the l_spread normalizer (its zero-masked entries don't
    # shift with the row), so a padded-column max would leak into the loss
    row_max = jnp.max(
        jnp.where(valid[None, :], logits, -jnp.inf), axis=1, keepdims=True
    )
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    logits = logits - jax.lax.stop_gradient(row_max)
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
    # reference executes it over the n valid rows, including three quirks
    # pinned by tests/test_reference_exec.py and test_secondary_models
    # (padding invariance):
    #   (a) augment columns are view-major (cat of unbind) but the augmask
    #       indexes sample-major — anchor b is paired with column
    #       j = b(V-1)+k, which holds view 1+j//n of sample j%n;
    #   (b) the normalizer is logsumexp over logits*posmask — zeroed
    #       non-positive VALID entries still contribute exp(0);
    #   (c) the per-row stability max over ALL aug columns is NOT cancelled
    #       by the normalizer, so it changes the value and must span
    #       exactly the valid (sample, view>=1) combinations.
    if V > 1:
        n = jnp.maximum(jnp.sum(valid), 1)
        # quirk (c): row max over every valid aug feature
        aug_all = jnp.einsum(
            "bz,svz->bsv", anchor, feats[:, 1:]
        ) / temperature  # [B, B, V-1]
        aug_all = jnp.where(valid[None, :, None], aug_all, -jnp.inf)
        row_max = jax.lax.stop_gradient(jnp.max(aug_all, axis=(1, 2)))
        row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)

        # quirk (a): dynamic pairing against the true batch size n
        k = jnp.arange(V - 1)
        col = jnp.arange(B)[:, None] * (V - 1) + k[None, :]  # [B, V-1]
        s = col % n
        v = jnp.clip(1 + col // n, 1, V - 1)
        pair_feats = feats[s, v]  # [B, V-1, Z]
        l = jnp.einsum("bz,bkz->bk", anchor, pair_feats) / temperature
        l = l - row_max[:, None]

        # quirk (b) over valid columns only
        pos_lse = jax.nn.logsumexp(
            jnp.where(valid[None, :], logits * posmask, -jnp.inf),
            axis=1, keepdims=True,
        )
        pos_lse = jnp.where(jnp.isfinite(pos_lse), pos_lse, 0.0)
        log_prob_sp = (l - pos_lse) * valid[:, None]
        lspread = -jnp.sum(log_prob_sp) / n
    else:
        lspread = jnp.float32(0.0)

    denom = a_lc + a_spread
    assert denom != 0
    return (a_lc * lsup + a_spread * lspread) / denom
