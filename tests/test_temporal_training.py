"""Sequence-chunked temporal training: hidden state carried across chunks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.data.dataloader import SequenceChunkLoader
from creste_public_tpu.data.synthetic import SyntheticCodaDataset
from creste_public_tpu.parallel import make_mesh, shard_batch
from creste_public_tpu.training import pipelines


def temporal_cfg():
    cfg = presets.tiny_terrainnet_config().to_dict()
    cfg["use_temporal"] = True
    cfg["temporal_layer"] = {
        "net_kwargs": {
            "rnn_input_channels": 16,
            "rnn_config": {"hidden_dims": [16], "groups": 1,
                           "cell_type": "GRU", "kernel_size": [1, 1]},
        }
    }
    # decode from the temporally merged features
    cfg["bev_classifier"]["net_kwargs"]["input_key"] = "merged_bev_features"
    return cfg


@pytest.mark.slow
def test_hidden_carry_across_chunks():
    cfg = temporal_cfg()
    ds = SyntheticCodaDataset(length=8, image_size=(64, 80), ds=4, grid=32,
                              map_range=1.6, fdn_dim=16, horizon=10)
    loader = SequenceChunkLoader(ds, batch_size=2, seq_len=4, chunk_len=2,
                                 shuffle=False)
    chunks = list(loader.epoch(0))
    keys = ("image", "depth_label", "fimg_label", "p2p", "fov_mask",
            "3d_sam_label", "3d_sam_dynamic_label", "elevation_label")
    chunks = [{k: c[k] for k in keys + ("bos",)} for c in chunks]

    sample = {k: v[:1] for k, v in chunks[0].items() if k != "bos"}
    model, lm, state, tx = pipelines.init_stage("ssc", cfg, sample,
                                                steps_per_epoch=4)
    mesh = make_mesh(2)
    step_bos = pipelines.make_temporal_train_step(
        model, lm, tx, mesh, task="joint", bos=True)
    step_mid = pipelines.make_temporal_train_step(
        model, lm, tx, mesh, task="joint", bos=False)

    hidden = pipelines.init_temporal_hidden(model, state, sample)
    hidden = jax.tree_util.tree_map(
        lambda h: jnp.tile(h, (2,) + (1,) * (h.ndim - 1)), hidden)

    rng = jax.random.PRNGKey(0)
    c0 = {k: v for k, v in chunks[0].items() if k != "bos"}
    c1 = {k: v for k, v in chunks[1].items() if k != "bos"}

    state, m0, hidden = step_bos(state, shard_batch(c0, mesh), rng, hidden)
    assert np.isfinite(float(m0["loss"]))
    h_arr = np.asarray(hidden[0])
    assert np.abs(h_arr).max() > 0  # hidden actually produced

    state, m1, hidden2 = step_mid(state, shard_batch(c1, mesh), rng, hidden)
    assert np.isfinite(float(m1["loss"]))

    # the carried hidden matters: a zeroed carry changes the next hidden
    zero_h = jax.tree_util.tree_map(jnp.zeros_like, hidden)
    _, _, hidden2_alt = step_mid(state, shard_batch(c1, mesh), rng, zero_h)
    diff = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(hidden2),
                        jax.tree_util.tree_leaves(hidden2_alt))
    )
    assert diff > 1e-6
