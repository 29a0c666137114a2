"""Mixed-precision inference utilities (bfloat16 weight casting).

TPU rationale: the deployed reward graph is HBM-bandwidth-bound at batch 1
(SURVEY §6 shapes); casting conv/dense kernels to bfloat16 halves weight
traffic and keeps the MXU on its native input type. BatchNorm statistics,
scales and biases stay float32 — the affine BN math is where bf16 rounding
compounds (running means up to ~1e3 for the mm-depth channel), and keeping
them f32 costs no bandwidth that matters (they are O(C) vectors).

This is an OPT-IN mode (`bench.py --bf16`, `compile.py --bf16`): it is NOT
parity-compatible with the <=1e-3 reward-deviation north star; the bench
prints the measured deviation next to the speedup so the trade is explicit.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# leaf names kept in float32 (BN statistics + affine params)
_KEEP_F32 = ("mean", "var", "scale", "bias")


def cast_variables(
    variables: dict, dtype: Any = jnp.bfloat16, keep_f32: tuple = _KEEP_F32
) -> dict:
    """Cast weight leaves of a flax variables dict to ``dtype``.

    Leaves whose name is in ``keep_f32`` (BN stats/affine, biases) and
    non-float leaves are left untouched.
    """

    def visit(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in keep_f32:
            return leaf
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return leaf
        return jnp.asarray(leaf, dtype)

    return jax.tree_util.tree_map_with_path(visit, variables)


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
