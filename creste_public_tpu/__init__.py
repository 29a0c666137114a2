"""CREStE-TPU: a TPU-native (JAX/XLA/Pallas) re-implementation of the
capabilities of ut-amrl/creste_public.

The package is organised bottom-up:

  utils/     pure-function geometry / depth / label numerics
  ops/       TPU compute kernels (splat, value iteration, SVF, rasterise)
  models/    flax.linen model zoo (EffNet-b0 RGBD backbone, TerrainNet, VIN, IRL)
  losses/    config-driven loss registry (LossManager)
  data/      UT CODa dataset reader + synthetic fixtures (host-side, NumPy)
  parallel/  mesh construction + sharding rules (pjit / shard_map over ICI)
  training/  train steps, optimizers with freeze schedules, orbax checkpoints
  config/    YAML config composition (hydra-like defaults + dotted overrides)

Everything on the device path is NHWC, statically shaped and jit-compatible;
dynamic control flow from the reference (unbounded value iteration,
data-dependent sampling) is re-designed as fixed-bound + masked computation.
"""

__version__ = "0.1.0"
