"""Train state container + data-parallel step wiring (mesh/pjit/shard_map).

The reference trains with PL DDP (NCCL all-reduce, per-GPU BN stats,
find_unused_parameters for frozen subtrees — SURVEY §2.7). TPU-native
equivalent implemented here:

  * one `jax.sharding.Mesh` with a 'data' axis,
  * the train step runs under `shard_map`: each device computes grads on its
    batch shard, `psum`-means them (replacing DDP all-reduce), and the
    contrastive loss all_gathers features over the 'data' axis inside the
    step (replacing torch.distributed.nn.all_gather),
  * BatchNorm batch statistics are computed per device (matching DDP's
    non-synced BN); the *running* stats updates are psum-averaged so the
    replicated state stays consistent,
  * frozen subtrees simply get zero grads (no find_unused_parameters
    machinery needed).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from creste_public_tpu.parallel.mesh import (  # noqa: F401 (re-exported)
    make_mesh,
    shard_batch,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )


def data_parallel_train_step(
    loss_and_updates: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    grad_transform: Callable | None = None,
):
    """Build the jitted SPMD train step.

    Args:
      loss_and_updates(params, batch_stats, batch, rng, axis_name) ->
        (loss, (new_batch_stats, metrics)) — the per-shard loss closure; it
        may use collectives over ``axis_name``.
      tx: optax transformation (replicated).
      mesh: 1-D 'data' mesh.

    Returns step(state, batch, rng) -> (state, metrics); batch arrays are
    sharded on their leading axis, state is replicated.
    """
    axis = "data"

    def _step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_updates(
                p, state.batch_stats, batch, rng, axis
            ),
            has_aux=True,
        )
        (loss, (new_stats, metrics)), grads = grad_fn(state.params)
        if grad_transform is not None:
            # e.g. the epoch-scheduled backbone freeze gate
            # (train_ssc.py:56-80 -> optim.scheduled_freeze_gate)
            grads = grad_transform(grads, batch)
        grads = jax.lax.pmean(grads, axis)
        # per-device BN batch stats (DDP-like); running stats averaged to
        # keep the replicated state consistent
        new_stats = jax.lax.pmean(new_stats, axis)
        metrics = jax.lax.pmean(metrics, axis)
        loss = jax.lax.pmean(loss, axis)

        # per-step gradient norm (train_pefree.py:101-112 logging parity)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    sharded = jax.shard_map(
        _step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
