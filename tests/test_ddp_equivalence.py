"""Multi-device training equivalence (VERDICT r3 #7).

Pins the SPMD train step's semantics against its reference contract (PL
DDP, train_ssc.py:342): per-device gradients pmean'd (DDP all-reduce),
BatchNorm batch statistics PER DEVICE (DDP does not sync BN), running
stats averaged into the replicated state.

Two claims, separated on purpose:

1. EXACT: the 8-device shard_map step equals a serial DDP emulation —
   per-shard grads/stats from the same loss closure, host-meaned, one
   optax update — to float-reduction precision. This pins the collective
   wiring: nothing in the mesh path adds or loses anything vs N
   independent workers + all-reduce.

2. DOCUMENTED DELTA: 8-device B=1x8 is NOT bitwise single-device B=8,
   and the entire gap is BatchNorm's batch statistics (each device
   normalizes over its own shard). With BN stats frozen (train=False
   has no other train-mode behaviour in this model: no dropout), the
   forward outputs match across layouts to conv-precision tolerance. This is the same
   equivalence class the reference ships: DDP(1x8) != 1GPU(B=8) in
   torch for the same reason.

Uses the distillation stage: its losses are per-sample (no cross-device
SupCon gather), so claim 1 has an exact serial emulation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
from creste_public_tpu.parallel import make_mesh, shard_batch
from creste_public_tpu.training import pipelines

pytestmark = pytest.mark.slow

B = 8


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticCodaDataset(
        length=B, image_size=(64, 80), ds=4, grid=32, map_range=1.6,
        fdn_dim=16, horizon=10,
    )
    batch = collate([ds[i] for i in range(B)])
    batch = {k: batch[k] for k in ("image", "depth_label", "fimg_label",
                                   "p2p")}
    cfg = presets.tiny_distillation_config()
    sample = jax.tree_util.tree_map(lambda x: x[:1], batch)
    model, lm, state, tx = pipelines.init_stage(
        "distillation", cfg, sample, steps_per_epoch=10
    )
    return batch, model, lm, state, tx


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_eight_device_step_equals_serial_ddp_emulation(setup):
    batch, model, lm, state, tx = setup
    mesh = make_mesh(8)
    step = pipelines.make_train_step("distillation", model, lm, tx, mesh,
                                     donate=False)
    rng = jax.random.PRNGKey(3)
    dev_state, _ = step(state, shard_batch(batch, mesh), rng)

    # serial DDP emulation: the same loss closure per B=1 shard with the
    # same per-device rng fold, host-meaned grads/stats, one optax update
    closure = pipelines.make_loss_closure("distillation", model, lm)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, s, b, r: closure(p, s, b, r), has_aux=True))
    grads_acc, stats_acc = [], []
    for i in range(B):
        shard = jax.tree_util.tree_map(lambda x: x[i:i + 1], batch)
        ri = jax.random.fold_in(rng, i)
        (_, (stats_i, _)), grads_i = grad_fn(
            state.params, state.batch_stats, shard, ri)
        grads_acc.append(grads_i)
        stats_acc.append(stats_i)
    mean = lambda *xs: sum(xs) / len(xs)  # noqa: E731
    grads = jax.tree_util.tree_map(mean, *grads_acc)
    stats = jax.tree_util.tree_map(mean, *stats_acc)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    for a, b in zip(_leaves(dev_state.params), _leaves(params)):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)
    for a, b in zip(_leaves(dev_state.batch_stats), _leaves(stats)):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


def test_bn_stats_are_the_only_layout_dependence(setup):
    batch, model, lm, state, tx = setup
    mesh8, mesh1 = make_mesh(8), make_mesh(1)
    rng = jax.random.PRNGKey(3)
    s8, m8 = pipelines.make_train_step(
        "distillation", model, lm, tx, mesh8, donate=False
    )(state, shard_batch(batch, mesh8), rng)
    s1, m1 = pipelines.make_train_step(
        "distillation", model, lm, tx, mesh1, donate=False
    )(state, shard_batch(batch, mesh1), rng)

    # NOT bitwise: per-device BN batch stats (B=1 shards) vs full-batch
    # stats (B=8) — the documented DDP-parity delta...
    diffs = [float(np.abs(a - b).max())
             for a, b in zip(_leaves(s8.params), _leaves(s1.params))]
    assert max(diffs) > 0.0
    # ...but bounded: one Adam step apart the trees stay within the step
    # scale (lr=5e-4; a blowup here would mean a wiring bug, not BN)
    assert max(diffs) < 2 * 5e-4 + 1e-6
    assert np.isfinite(float(m8["loss"])) and np.isfinite(float(m1["loss"]))

    # with BN batch statistics out of the picture (train=False; the model
    # has no dropout) the forward pass is layout-independent up to conv
    # reduction order (CPU convs re-tile per batch shape; ~1e-4 here)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["image"]), jnp.asarray(batch["p2p"]),
        train=False,
    )
    per_sample = [
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["image"][i:i + 1]),
            jnp.asarray(batch["p2p"][i:i + 1]), train=False,
        )
        for i in range(B)
    ]
    key = "depth_preds_metric"
    stacked = np.concatenate([np.asarray(p[key]) for p in per_sample])
    np.testing.assert_allclose(np.asarray(out[key]), stacked,
                               atol=1e-3, rtol=1e-3)
