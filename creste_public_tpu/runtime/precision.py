"""Mixed-precision (bfloat16) weight/activation utilities.

TPU rationale: the deployed reward graph is HBM-bandwidth-bound at batch 1
(95% of the v5e's 819 GB/s at f32 — bench.py roofline fields), so the only
way past the f32 speed of light is moving fewer bytes. The opt-in
`compute_dtype: bfloat16` mode runs the activation stream in bfloat16 while
keeping the numerics-critical islands in float32:

  * the RGBD input and the EffNet stem (the mm-scale depth channel would
    quantise at ~0.4% relative — 10 cm at range — before the network even
    sees it); bfloat16 enters AFTER the stem BN+silu,
  * every BatchNorm's internal math (models.blocks.convnets.batch_norm
    upcasts to f32 and casts back, so running stats and the large-mean
    subtraction stay exact while the stream stays bf16),
  * the depth head + softmax-expectation metric depth (drives the splat
    voxel coordinates — geometry stays f32),
  * the splat scatter accumulator (f32 adds; only the emitted bev_features
    are cast back to the stream dtype).

Weights are cast once via `cast_variables` (module-aware: BatchNorm
statistics AND affine params stay f32 so the f32 norm math has f32 inputs;
conv/dense kernels and biases go bf16 so flax dtype promotion keeps the
stream bf16). This is an OPT-IN mode (`bench.py --bf16`,
`compile.py --bf16`, training `compute_dtype`): it is NOT parity-compatible
with the <=1e-3 reward-deviation north star; the bench prints the measured
deviation next to the speedup so the trade is explicit.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_variables(variables: dict, dtype: Any = jnp.bfloat16) -> dict:
    """Cast weight leaves of a flax variables dict to ``dtype``.

    Module-aware: a subtree that carries normalisation state — ``scale``
    (norm affine, params collection) or ``mean``/``var`` (running stats,
    batch_stats collection) — is left entirely in float32, including its
    ``bias``; conv/dense ``bias`` leaves elsewhere ARE cast so flax dtype
    promotion keeps the activation stream in ``dtype`` (a single f32 bias
    would silently upcast the whole layer). Non-float leaves untouched.
    """

    from collections.abc import Mapping

    def cast_tree(tree):
        if isinstance(tree, Mapping):  # dict or flax FrozenDict
            if "scale" in tree or "mean" in tree or "var" in tree:
                return tree  # norm module: statistics + affine stay f32
            mapped = {k: cast_tree(v) for k, v in tree.items()}
            return mapped if isinstance(tree, dict) else type(tree)(mapped)
        leaf = jnp.asarray(tree)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return tree

    return cast_tree(variables)


def max_abs_deviation(a: Any, b: Any) -> float:
    """Max-abs elementwise deviation between two pytrees (f32 compare)."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    dev = 0.0
    for x, y in zip(la, lb):
        dev = max(dev, float(jnp.max(jnp.abs(
            jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)
        ))))
    return dev
