"""Temporal BEV aggregation: grouped ConvGRU / MRU cells (flax, NHWC).

Parity targets: creste/models/blocks/convgru.py:13-120 (ConvGRUCell /
ConvGRU) and creste/models/blocks/rnn.py:8-146 (MergeUnit). Behaviour
reproduced:

  * GRU cell: gates = sigmoid(conv([x, h])); candidate = tanh(conv([x,
    reset * h])); h' = (1-update) h + update * cand.
  * MRU cell (minimal-gated, arXiv:1603.09420): a single gate serves as
    both reset and update.
  * 'simple' cell: h' = x + h (no parameters).
  * MergeUnit: optional 1x1 pre-RNN conv, channel groups folded into the
    batch axis, multi-layer stacking, begin-of-sequence hidden reset and
    detached cross-chunk hidden state (rnn.py:117-135 -> stop_gradient on
    the returned carry; the caller threads it between chunks).

TPU-first design: the recurrence is a `jax.lax.scan` over the (short)
frame axis — an O(T) grid recurrence, not attention (SURVEY §5
long-context) — so the whole chunk compiles to one fused loop. Channel
groups become a batch fold, which XLA tiles better than grouped convs at
these sizes.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import batch_norm

Array = Any


class ConvGRUCell(nn.Module):
    """One recurrent cell over NHWC maps.

    cell_type: 'GRU' | 'MRU' | 'simple'.
    """

    hidden_dim: int
    kernel: tuple[int, int] = (1, 1)
    cell_type: str = "GRU"

    @nn.compact
    def __call__(self, x: Array, h: Array) -> Array:
        if self.cell_type == "simple":
            return x + h
        combined = jnp.concatenate([x, h], axis=-1)
        n_gates = 2 if self.cell_type == "GRU" else 1
        gates = nn.Conv(
            self.hidden_dim * n_gates, self.kernel, padding="SAME",
            name="conv_gates",
        )(combined)
        if self.cell_type == "GRU":
            reset = jax.nn.sigmoid(gates[..., : self.hidden_dim])
            update = jax.nn.sigmoid(gates[..., self.hidden_dim :])
        elif self.cell_type == "MRU":
            reset = update = jax.nn.sigmoid(gates)
        else:
            raise ValueError(f"Unknown cell_type: {self.cell_type}")
        cand = nn.Conv(
            self.hidden_dim, self.kernel, padding="SAME", name="conv_can"
        )(jnp.concatenate([x, reset * h], axis=-1))
        cand = jnp.tanh(cand)
        return (1.0 - update) * h + update * cand


class ConvGRU(nn.Module):
    """Stacked ConvGRU layers scanned over the frame axis.

    Input [B, T, H, W, C] -> (outputs [B, T, H, W, C_last],
    final hidden states per layer, each [B, H, W, C_l]).
    """

    hidden_dims: Sequence[int]
    kernel: tuple[int, int] = (1, 1)
    cell_type: str = "GRU"

    @nn.compact
    def __call__(
        self, x: Array, hidden: Sequence[Array] | None = None
    ) -> tuple[Array, list[Array]]:
        B, T, H, W, _ = x.shape
        finals = []
        for li, hdim in enumerate(self.hidden_dims):
            cell = ConvGRUCell(
                hidden_dim=hdim, kernel=self.kernel,
                cell_type=self.cell_type, name=f"cell_{li}",
            )
            h0 = (
                hidden[li]
                if hidden is not None
                else jnp.zeros((B, H, W, hdim), x.dtype)
            )

            # nn.scan shares cell params across time steps.
            scan = nn.scan(
                lambda c, carry, xt: (c(xt, carry),) * 2,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            h_last, ys = scan(cell, h0, x)
            finals.append(h_last)
            x = ys
        return x, finals


class MergeUnit(nn.Module):
    """Temporal merge of BEV feature chunks (rnn.py:8-146 equivalent).

    cfg keys: input_channels, rnn_input_channels (optional 1x1 projection),
    rnn_config {hidden_dims, input_size, kernel_size, groups, cell_type,
    force_bos}. ``None`` rnn_config means pass-through (+ optional conv).
    """

    cfg: Any

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: int = 1,
        hidden: list[Array] | None = None,
        bos: bool = True,
        train: bool = False,
    ) -> Array | tuple[Array, list[Array]]:
        """
        Args:
          x: [B*T, H, W, C] BEV features.
          t: frames per sequence chunk (static).
          hidden: carried hidden states from the previous chunk (or None).
          bos: True at the beginning of a sequence -> zero-init hidden.

        Returns merged features [B*T, H, W, C'] and, when an RNN is
        configured, the detached hidden-state list for the next chunk.
        """
        cfg = self.cfg
        rnn_in = cfg.get("rnn_input_channels", None)
        if rnn_in is not None:
            # ConvLayer(kernel=1, bn=True) — bias-free conv (conv.py:63-72)
            x = nn.Conv(int(rnn_in), (1, 1), use_bias=False,
                        name="pre_rnn_conv")(x)
            x = batch_norm(train, name="pre_rnn_bn")(x)
            x = nn.relu(x)

        rnn_cfg = cfg.get("rnn_config", None)
        if rnn_cfg is None:
            return x

        if rnn_cfg.get("force_bos", False):
            t, bos = 1, True

        bt, H, W, C = x.shape
        b = bt // t
        groups = int(rnn_cfg.get("groups", 1))
        assert C % groups == 0, "channels must divide groups"
        hidden_dims = [int(h) // groups for h in rnn_cfg["hidden_dims"]]

        # groups -> batch fold: [B, T, H, W, G, C/G] -> [B*G, T, H, W, C/G]
        xg = x.reshape(b, t, H, W, groups, C // groups)
        xg = jnp.moveaxis(xg, 4, 1).reshape(b * groups, t, H, W, C // groups)

        rnn = ConvGRU(
            hidden_dims=tuple(hidden_dims),
            kernel=tuple(rnn_cfg.get("kernel_size", (1, 1))),
            cell_type=rnn_cfg.get("cell_type", "GRU"),
            name="rnn",
        )
        h0 = None if bos else hidden
        ys, finals = rnn(xg, h0)

        # unfold groups: [B*G, T, H, W, C'] -> [B*T, H, W, G*C']
        Cl = ys.shape[-1]
        ys = ys.reshape(b, groups, t, H, W, Cl)
        ys = jnp.moveaxis(ys, 1, 4).reshape(bt, H, W, groups * Cl)

        # cross-chunk detach (rnn.py:131-135)
        finals = [jax.lax.stop_gradient(h) for h in finals]
        return ys, finals
