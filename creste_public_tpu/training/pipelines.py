"""Stage pipelines: model + LossManager + optimizer -> SPMD train step.

Replaces the reference's three LightningModules (train_pefree.py:35
DistillationModel, train_ssc.py:43 TerrainNetModel, train_traversability.py:34
MaxEntIRLModel) with pure-functional JAX training:

  * one loss closure per stage mapping the host batch (inputs/...) and model
    outputs (outputs/...) into the merged tensor dict the LossManager reads,
  * `jax.value_and_grad` + psum-mean over the 'data' mesh axis
    (training/state.py) instead of Lightning's DDP backward,
  * stage-3 manual optimization (automatic_optimization=False,
    train_traversability.py:39) is the natural form here — every step is
    explicit,
  * the IRL gradient penalty uses `jax.grad` through the reward head only,
    with the backbone cut off by `stop_gradient` (vin.py:110-117 contract).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from creste_public_tpu.losses import LossManager
from creste_public_tpu.models.depth_completion import DepthCompletionModel
from creste_public_tpu.models.distillation import DistillationBackbone
from creste_public_tpu.models.lfd import MaxEntIRL
from creste_public_tpu.models.terrainnet import TerrainNet
from creste_public_tpu.training import optim
from creste_public_tpu.training.state import (
    TrainState,
    data_parallel_train_step,
)

Array = Any

STAGES = ("depth", "distillation", "ssc", "traversability")


def build_model(stage: str, cfg: Any):
    cfg = cfg.to_dict() if hasattr(cfg, "to_dict") else cfg
    if stage == "depth":
        return DepthCompletionModel(cfg)
    if stage == "distillation":
        return DistillationBackbone(cfg)
    if stage == "ssc":
        return TerrainNet(cfg)
    if stage == "traversability":
        return MaxEntIRL(cfg)
    raise ValueError(f"Unknown stage: {stage} (expected one of {STAGES})")


def model_inputs(stage: str, batch: dict) -> tuple:
    """Positional model args for a stage from the batch dict."""
    rgbd = batch["image"]
    p2p = batch["p2p"]
    if stage in ("depth", "distillation"):
        return (rgbd, p2p)
    if stage == "ssc":
        return (rgbd, p2p, batch.get("mv_mask", None))
    return (rgbd, p2p, batch.get("traversability_label", None))


def merge_tensor_dict(batch: dict, outputs: dict, task: str | None) -> dict:
    td: dict = {}
    for k, v in batch.items():
        td[f"inputs/{k}"] = v
    for k, v in outputs.items():
        td[f"outputs/{k}"] = v
    if task is not None:
        td["task"] = task
    return td


def make_loss_closure(
    stage: str,
    model,
    loss_manager: LossManager,
    task: str | None = None,
) -> Callable:
    """loss_and_updates(params, batch_stats, batch, rng, axis_name) ->
    (total, (new_batch_stats, metrics)) for data_parallel_train_step."""

    # Opt-in mixed-precision compute (model cfg `compute_dtype: bfloat16`):
    # master params stay f32 in the optimizer; non-norm weights are cast to
    # bf16 and the models run their activation stream in bf16 (the cast
    # enters after the EffNet stem; BatchNorm math, the depth head and the
    # splat geometry stay f32 — see runtime.precision). Inputs are NOT cast
    # (the mm-scale depth channel would quantise at ~0.4%). Outputs/losses
    # and batch stats are f32. Grad of an f32 master param through the
    # cast is f32 (the cast VJP casts back).
    mcfg = getattr(model, "cfg", None)
    compute_dtype = None
    if isinstance(mcfg, dict) and mcfg.get("compute_dtype"):
        compute_dtype = jnp.dtype(mcfg["compute_dtype"])

    def _cast_float(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def loss_and_updates(params, batch_stats, batch, rng, axis_name=None):
        variables = {"params": params, "batch_stats": batch_stats}
        args = model_inputs(stage, batch)
        if compute_dtype is not None:
            from creste_public_tpu.runtime.precision import cast_variables

            if stage == "traversability":
                # stage 3: the cast applies to the FROZEN backbone only —
                # its forward is ~60% of the step and carries no gradient
                # (input_view is stop-gradient, vin.py:110-117), while the
                # IRL math (reward net, VI/SVF, penalty) stays exact f32
                # (build_input_view casts the reward input back to f32).
                # Measured on v5e @ B=10: 187.5 ms/step vs 211.9 ms f32
                # (53.3 vs 47.2 samples/s, train_step_bench --stage
                # traversability --dtype bfloat16).
                variables = {
                    "params": {
                        **variables["params"],
                        "backbone": cast_variables(
                            variables["params"]["backbone"], compute_dtype
                        ),
                    },
                    "batch_stats": {
                        **variables["batch_stats"],
                        "backbone": cast_variables(
                            variables["batch_stats"].get("backbone", {}),
                            compute_dtype,
                        ),
                    },
                }
            else:
                variables = cast_variables(variables, compute_dtype)
        outputs, mutated = model.apply(
            variables,
            *args,
            train=True,
            mutable=["batch_stats"],
            # 'noise' feeds ConvGRU pose noisification when a temporal
            # config sets noisy_pose (reference convgru.py:289-290);
            # unused rngs are ignored by flax.
            rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 7)},
        )
        if compute_dtype is not None:
            outputs = _cast_float(outputs, jnp.float32)
            mutated = {"batch_stats": _cast_float(
                mutated["batch_stats"], jnp.float32)}
        td = merge_tensor_dict(batch, outputs, task)
        aux = {"rng": rng, "axis_name": axis_name}
        if stage == "traversability":
            # WGAN-style gradient-penalty hook: reward-net-only forward on
            # the (already stop-gradient) input_view. Eval-mode BN — the
            # penalty must not perturb running stats.
            aux["reward_fn"] = lambda iv: model.apply(
                variables, iv, False, method=MaxEntIRL.reward
            )
        loss_dict, meta = loss_manager(td, aux)
        total = LossManager.total(loss_dict)
        metrics = {k: w * v for k, (w, v) in loss_dict.items()}
        metrics.update(
            {k: v for k, v in meta.items() if jnp.ndim(v) == 0}
        )
        return total, (mutated["batch_stats"], metrics)

    return loss_and_updates


def init_stage(
    stage: str,
    cfg: Any,
    sample_batch: dict,
    seed: int = 0,
    steps_per_epoch: int = 100,
    frozen_pred=None,
):
    """Initialise (model, loss_manager, state, tx) for a stage.

    frozen_pred: optional path predicate marking frozen params (see
    optim.LOAD_SETTING_FROZEN); stage 'traversability' defaults to freezing
    the whole backbone (lfd.py:81-90 strict_freeze).
    """
    cfg_d = cfg.to_dict() if hasattr(cfg, "to_dict") else cfg
    model = build_model(stage, cfg_d)
    loss_manager = LossManager(cfg_d)

    args = model_inputs(stage, jax.tree_util.tree_map(jnp.asarray, sample_batch))
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        *args,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if frozen_pred is None and stage == "traversability":
        frozen_pred = lambda p: p.startswith("backbone")  # noqa: E731
    mask = optim.freeze_mask(params, frozen_pred) if frozen_pred else None
    tx = optim.make_optimizer(
        cfg_d.get("optimizer", {}),
        cfg_d.get("lr_scheduler", {}),
        steps_per_epoch,
        trainable_mask=mask,
    )
    state = TrainState.create(params, batch_stats, tx)
    return model, loss_manager, state, tx


def make_train_step(stage, model, loss_manager, tx, mesh, task=None,
                    freeze_backbone_schedule: bool = False,
                    donate: bool = True):
    """freeze_backbone_schedule: when True, the batch may carry a scalar
    '_backbone_unfrozen' gate (0/1); backbone grads are multiplied by it —
    the epoch-scheduled freeze of train_ssc.py:56-80 without recompiling."""
    closure = make_loss_closure(stage, model, loss_manager, task=task)
    grad_transform = None
    if freeze_backbone_schedule:
        from creste_public_tpu.training.optim import scheduled_freeze_gate

        def grad_transform(grads, batch):  # noqa: F811
            gate = batch.get("_backbone_unfrozen", None)
            if gate is None:
                return grads
            # [B] per-sample copies so the leaf shards over 'data'
            return scheduled_freeze_gate(
                grads, lambda p: p.startswith("depthcomp"),
                gate.reshape(-1)[0],
            )

    return data_parallel_train_step(closure, tx, mesh, donate=donate,
                                    grad_transform=grad_transform)


def make_temporal_train_step(model, loss_manager, tx, mesh, task=None,
                             bos: bool = True, donate: bool = False):
    """SPMD step for sequence-chunked TerrainNet training: the ConvGRU
    hidden state is an explicit carry — step(state, batch, rng, hidden) ->
    (state, metrics, new_hidden). `bos` is static (chunk 0 ignores the
    carried hidden and zero-inits; rnn.py:117-124). Hidden arrays already
    carry stop_gradient (convgru.MergeUnit), matching the reference's
    detached cross-chunk state."""
    from jax.sharding import PartitionSpec as P

    from creste_public_tpu.training.state import TrainState  # noqa: F401

    axis = "data"

    def _step(state, batch, rng, hidden):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = model.apply(
                variables,
                batch["image"], batch["p2p"], None,
                train=True, temporal_hidden=hidden, bos=bos,
                pose=batch.get("pose"),
                mutable=["batch_stats"],
                rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 7)},
            )
            td = merge_tensor_dict(batch, outputs, task)
            loss_dict, meta = loss_manager(td, {"rng": rng,
                                                "axis_name": axis})
            total = LossManager.total(loss_dict)
            metrics = {k: w * v for k, (w, v) in loss_dict.items()}
            metrics.update(
                {k: v for k, v in meta.items() if jnp.ndim(v) == 0}
            )
            return total, (mutated["batch_stats"],
                           outputs["temporal_hidden"], metrics)

        (loss, (stats, new_hidden, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        stats = jax.lax.pmean(stats, axis)
        metrics = jax.lax.pmean(dict(metrics, loss=loss), axis)
        import optax as _optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = _optax.apply_updates(state.params, updates)
        import dataclasses

        new_state = dataclasses.replace(
            state, step=state.step + 1, params=new_params,
            batch_stats=stats, opt_state=new_opt,
        )
        return new_state, metrics, new_hidden

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(axis)),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def init_temporal_hidden(model, state, sample_batch):
    """Zero hidden-state template with the right shapes (one eval forward)."""
    outputs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(sample_batch["image"]), jnp.asarray(sample_batch["p2p"]),
        None, train=False,
    )
    return jax.tree_util.tree_map(jnp.zeros_like,
                                  outputs["temporal_hidden"])


def host_batch(batch: dict) -> dict:
    """np-ify a batch (drop None leaves)."""
    return jax.tree_util.tree_map(np.asarray, batch)
