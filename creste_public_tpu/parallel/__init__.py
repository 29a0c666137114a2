"""Mesh construction + sharding rules (pjit / shard_map over ICI).

The reference's only training parallelism is DDP data-parallel with NCCL
all-reduce plus a differentiable all_gather inside the contrastive loss
(SURVEY §2.7). TPU-native equivalents live here:

  * `make_mesh` — one `jax.sharding.Mesh` over a 'data' axis (grown to
    ('data', 'model') when tensor sharding is ever needed; the CREStE
    models are <30M params so DP is the right layout).
  * `shard_batch` / `replicate` — NamedSharding placement of host batches
    and replicated state.
  * the shard_map SPMD step itself lives in `training.state.
    data_parallel_train_step`: per-device grads, `psum`-mean (replacing DDP
    all-reduce over NCCL with XLA collectives over ICI), per-device
    BatchNorm batch stats (matching DDP's unsynced BN) with psum-averaged
    running stats.
  * the supcon loss gathers negatives with `jax.lax.all_gather(...,
    axis_name='data')` inside the step (losses/supcon.py), replacing
    torch.distributed.nn.all_gather (supcon_loss.py:43-78).
"""
from creste_public_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    make_mesh,
    make_spatial_mesh,
    replicate,
    shard_batch,
    spatial_inference_shardings,
)

__all__ = [
    "DATA_AXIS", "SPATIAL_AXIS", "make_mesh", "make_spatial_mesh",
    "replicate", "shard_batch", "spatial_inference_shardings",
]
