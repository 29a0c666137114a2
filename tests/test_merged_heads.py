"""Merged decoder-head rewrite: exact parity with per-head DeconvHeads.

VERDICT r4 #4b: the three DeconvHeads (32+6+2 ch) of the BEV decoder
(reference creste/models/blocks/inpainting.py:52-109) merged into one
block-diagonal conv tail — fewer small ops at the bf16 latency floor.
This test pins that ``merged_heads=True`` plus
``merge_decoder_head_variables`` reproduces the unmerged numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creste_public_tpu.models.blocks.resnet import (
    InpaintingResNet18MultiHead,
    merge_decoder_head_variables,
    merge_heads_in_variables,
)

NUM_CLASSES = (7, 3, 2)
PREFIXES = ("inpainting_sam", "inpainting_sem", "elevation")


def _mk(merged, llw=False):
    return InpaintingResNet18MultiHead(
        num_classes=NUM_CLASSES, output_prefix=PREFIXES,
        learnable_loss_weight=llw, merged_heads=merged,
    )


def _rand_stats(vs, key):
    """Replace init batch_stats (mean 0 / var 1) with random values so the
    test exercises the BN merge, not its trivial fixed point."""
    leaves, treedef = jax.tree.flatten(vs["batch_stats"])
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.uniform(k, l.shape, l.dtype, 0.25, 2.0)
           for k, l in zip(keys, leaves)]
    out = dict(vs)
    out["batch_stats"] = jax.tree.unflatten(treedef, new)
    return out


@pytest.mark.parametrize("llw", [False, True])
def test_merged_heads_match_per_head(llw):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 40, 16), jnp.float32)
    td = {"bev_features": x}

    base = _mk(False, llw)
    vs = _rand_stats(base.init({"params": rng}, td), jax.random.PRNGKey(3))
    ref = base.apply(vs, td)

    mp, ms = merge_decoder_head_variables(
        vs["params"], vs["batch_stats"], NUM_CLASSES)
    merged = _mk(True, llw)
    got = merged.apply({"params": mp, "batch_stats": ms}, td)

    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=0, atol=2e-5,
            err_msg=k)


def test_merged_param_tree_shape():
    rng = jax.random.PRNGKey(1)
    td = {"bev_features": jnp.zeros((1, 16, 16, 8))}
    vs = _mk(False).init({"params": rng}, td)
    mp, ms = merge_decoder_head_variables(
        vs["params"], vs["batch_stats"], NUM_CLASSES)
    # merged tree is what merged_heads=True initializes (same shapes)
    vs2 = _mk(True).init({"params": rng}, td)
    ref_shapes = jax.tree.map(jnp.shape, vs2["params"])
    got_shapes = jax.tree.map(jnp.shape, mp)
    assert ref_shapes == got_shapes
    assert jax.tree.map(jnp.shape, vs2["batch_stats"]) == jax.tree.map(
        jnp.shape, ms)
    # no stray per-head params survive the merge
    assert not any(k.startswith("head_") for k in mp)


def test_merge_full_variables_entrypoint():
    """merge_heads_in_variables rewrites only the bevclassifier subtree."""
    rng = jax.random.PRNGKey(2)
    td = {"bev_features": jnp.zeros((1, 16, 16, 8))}
    vs = _mk(False).init({"params": rng}, td)
    full = {
        "params": {"backbone": {"bevclassifier": vs["params"],
                                "other": {"w": jnp.ones((3,))}}},
        "batch_stats": {"backbone": {"bevclassifier": vs["batch_stats"]}},
    }
    out = merge_heads_in_variables(full, NUM_CLASSES)
    assert "mh_conv0" in out["params"]["backbone"]["bevclassifier"]
    assert not any(k.startswith("head_")
                   for k in out["params"]["backbone"]["bevclassifier"])
    np.testing.assert_array_equal(
        np.asarray(out["params"]["backbone"]["other"]["w"]), np.ones((3,)))
    # source tree untouched (functional rewrite)
    assert "head_0" in full["params"]["backbone"]["bevclassifier"]
