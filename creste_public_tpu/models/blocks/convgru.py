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

Pose-warped variant (reference convgru.py:123-349 ``use_pose`` path):
before each cell update the hidden state is re-warped into the incoming
frame's coordinate frame by the relative SE(2) affine
``inv(_2d(pose_t)) @ _2d(pose_{t-1})`` (optionally noisified, convgru.py:
212-233 ``_noisify``; optionally z-offset-conditioned via the ``z_map``
MLP, convgru.py:296-299). TPU-first restructure: the per-step affine
chain, its noise, and the z-MLP depend only on the pose *sequence*, so
they are computed batched OUTSIDE the scan — the recurrence body carries
just (warp + cell), keeping the compiled loop minimal. The first frame
of a fresh sequence has no previous pose (reference carries
``cell_pose=None``); we carry an explicit validity flag and select the
un-warped hidden state instead of Python ``None`` branches.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import batch_norm
from creste_public_tpu.ops.warp import (
    affine_warp,
    noisify_affine,
    relative_bev_affine,
)

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

    With ``use_pose`` (reference convgru.py:123-349): ``pose`` is
    [B, T, 4, 4] (or [B, T, L, 4, 4] per-layer) SE(3) poses; the hidden
    state is warped into each incoming frame's coordinate frame before
    the cell update. Hidden entries become tuples
    ``(h [B,H,W,C_l], cell_pose [B,4,4], valid [B] bool)`` so a fresh
    sequence (reference ``cell_pose=None``) stays jit-static.
    """

    hidden_dims: Sequence[int]
    kernel: tuple[int, int] = (1, 1)
    cell_type: str = "GRU"
    use_pose: bool = False
    noisy_pose: bool = False
    use_z: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        hidden: Sequence[Any] | None = None,
        pose: Array | None = None,
    ) -> tuple[Array, list[Any]]:
        B, T, H, W, _ = x.shape
        L = len(self.hidden_dims)
        if self.use_pose:
            assert pose is not None, "use_pose requires per-step poses"
            if pose.ndim == 4:  # [B,T,4,4] shared across layers
                pose = jnp.broadcast_to(
                    pose[:, :, None], (B, T, L) + pose.shape[-2:]
                )
            if self.use_z:
                # convgru.py:172-178: single z-conditioning MLP (asserts
                # one layer in the reference)
                assert L == 1, "use_z supports a single recurrent layer"

        finals: list[Any] = []
        for li, hdim in enumerate(self.hidden_dims):
            cell = ConvGRUCell(
                hidden_dim=hdim, kernel=self.kernel,
                cell_type=self.cell_type, name=f"cell_{li}",
            )
            carried = hidden[li] if hidden is not None else None
            if not self.use_pose:
                h0 = (
                    carried
                    if carried is not None
                    else jnp.zeros((B, H, W, hdim), x.dtype)
                )
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
                continue

            # ---- pose-warped path ----
            if carried is not None:
                h0, cp0, valid0 = carried
            else:
                h0 = jnp.zeros((B, H, W, hdim), x.dtype)
                cp0 = jnp.broadcast_to(jnp.eye(4, dtype=x.dtype), (B, 4, 4))
                valid0 = jnp.zeros((B,), bool)

            pl = pose[:, :, li]  # [B,T,4,4]
            # cell_pose at step t is pose_{t-1} (pose carried in for t=0):
            # the whole affine chain is pose-only, so hoist it out of the
            # recurrence (batched over T).
            prev = jnp.concatenate([cp0[:, None], pl[:, :-1]], axis=1)
            M = relative_bev_affine(pl, prev)  # [B,T,2,3]
            if self.noisy_pose:
                # The reference applies _noisify UNCONDITIONALLY when
                # noisy_pose is set (convgru.py:289-290, torch.randn on
                # every forward) — silently skipping it when the caller
                # forgot the rng would train without pose noise. Fail
                # loudly instead; pipelines.py plumbs a 'noise' rng.
                if not self.has_rng("noise"):
                    raise ValueError(
                        "ConvGRU(noisy_pose=True) requires an rng named "
                        "'noise' (pass rngs={'noise': key} to apply); the "
                        "reference noisifies the pose on every forward "
                        "(convgru.py:289-290)"
                    )
                key = self.make_rng("noise")
                kr, kt = jax.random.split(key)
                M = noisify_affine(
                    M,
                    jax.random.normal(kr, (B, T)),
                    jax.random.normal(kt, (B, T, 2)),
                )
            valid = jnp.concatenate(
                [valid0[:, None], jnp.ones((B, T - 1), bool)], axis=1
            )
            if self.use_z:
                # convgru.py:296-299: dz between consecutive frames,
                # mapped by the z MLP; tanh applied before the add.
                dz = (-pl[:, :, 2, 3] + prev[:, :, 2, 3])[..., None]
                zh = nn.Dense(hdim, name="z_map_0")(dz)
                zh = nn.Dense(hdim, name="z_map_2")(nn.relu(zh))
                zadd = jnp.tanh(zh)  # [B,T,hdim]
            else:
                zadd = jnp.zeros((B, T, 1), x.dtype)

            def step(c, h, xs):
                xt, Mt, zt, vt = xs
                warped, _ = affine_warp(h, Mt, with_mask=False)
                if self.use_z:
                    warped = warped + zt[:, None, None, :].astype(h.dtype)
                h = jnp.where(vt[:, None, None, None], warped, h)
                h = c(xt, h)
                return h, h

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            h_last, ys = scan(cell, h0, (x, M, zadd, valid))
            finals.append((h_last, pl[:, -1], jnp.ones((B,), bool)))
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
        pose: Array | None = None,
    ) -> Array | tuple[Array, list[Array]]:
        """
        Args:
          x: [B*T, H, W, C] BEV features.
          t: frames per sequence chunk (static).
          hidden: carried hidden states from the previous chunk (or None).
          bos: True at the beginning of a sequence -> zero-init hidden.
          pose: [B*T, 4, 4] per-frame SE(3) poses, required when
            ``rnn_config.use_pose`` — the hidden state is pose-warped
            between frames (reference convgru.py:123-349; the reference
            MergeUnit carries the same plumbing commented out at
            rnn.py:59-127).

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

        use_pose = bool(rnn_cfg.get("use_pose", False))
        rnn = ConvGRU(
            hidden_dims=tuple(hidden_dims),
            kernel=tuple(rnn_cfg.get("kernel_size", (1, 1))),
            cell_type=rnn_cfg.get("cell_type", "GRU"),
            use_pose=use_pose,
            noisy_pose=bool(rnn_cfg.get("noisy_pose", False)),
            use_z=bool(rnn_cfg.get("use_z", False)),
            name="rnn",
        )
        h0 = None if bos else hidden
        pose_g = None
        if use_pose:
            assert pose is not None, "rnn_config.use_pose requires poses"
            # groups fold is b-major (batch index = b*G + g), so each
            # batch row's pose repeats per group
            pose_g = jnp.repeat(pose.reshape(b, t, 4, 4), groups, axis=0)
        ys, finals = rnn(xg, h0, pose=pose_g)

        # unfold groups: [B*G, T, H, W, C'] -> [B*T, H, W, G*C']
        Cl = ys.shape[-1]
        ys = ys.reshape(b, groups, t, H, W, Cl)
        ys = jnp.moveaxis(ys, 1, 4).reshape(bt, H, W, groups * Cl)

        # cross-chunk detach (rnn.py:131-135)
        finals = [jax.lax.stop_gradient(h) for h in finals]
        return ys, finals
