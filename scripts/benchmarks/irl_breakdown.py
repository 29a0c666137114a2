"""Stage-3 IRL train-step breakdown at the production B=10 shape.

Attributes the measured ~212 ms step (train_step_bench --stage
traversability) to its phases so optimization effort goes where the time
is (VERDICT r3 #4: "attack the stage-3 serial chain ... or a profile
proving the floor"):

  fwd_nomdp   frozen TerrainNet backbone + VIN reward head (solve_mdp off)
  fwd_mdp     + value iteration + policy + SVF propagation + rollout
  vi_only     the Pallas VI solve alone on a fresh reward map
  svf_only    the Pallas SVF propagation alone
  full step   fwd + IRL loss (expert rasterization, cf mixing, gradient
              penalty double-backward) + optimizer

Every phase is timed with fresh perturbed inputs per call (the axon
tunnel memoizes (program, args) executions — runtime/benchmark.py).

Usage: python scripts/benchmarks/irl_breakdown.py [--batch 10] [--iters 10]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import time

import numpy as np


def timed(fn, make_args, iters):
    fn(*make_args(0))  # compile
    ts = []
    for i in range(1, iters + 1):
        a = make_args(i)
        t0 = time.perf_counter()
        import jax

        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import (
        enable_compile_cache,
        ensure_env_platform,
    )

    ensure_env_platform()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from creste_public_tpu.config import presets
    from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.ops.svf import expected_svf
    from creste_public_tpu.ops.value_iteration import value_iteration
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch
    from creste_public_tpu.training import pipelines

    B = args.batch
    cfg = presets.traversability_model_config()
    cfg["batch_size"] = B

    ds = SyntheticCodaDataset(length=B)
    batch = collate([ds[i] for i in range(B)])
    mesh = make_mesh()
    model, lm, state, tx = pipelines.init_stage(
        "traversability", cfg,
        jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch),
        steps_per_epoch=100,
    )
    step = pipelines.make_train_step("traversability", model, lm, tx, mesh,
                                     task=None, donate=False)
    sb = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)

    nomdp = MaxEntIRL(cfg={**cfg, "solve_mdp": False})

    rgbd = jnp.asarray(batch["image"])
    p2p = jnp.asarray(batch["p2p"])
    expert = jnp.asarray(batch["traversability_label"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd_nomdp(v, x):
        return nomdp.apply(v, x, p2p, expert, False)

    @jax.jit
    def fwd_mdp(v, x):
        return model.apply(v, x, p2p, expert, False)

    def fresh_img(i):
        return (variables,
                rgbd + jnp.float32(i) * 1e-4)

    results = {}
    results["fwd_nomdp_ms"] = timed(fwd_nomdp, fresh_img, args.iters)
    results["fwd_mdp_ms"] = timed(fwd_mdp, fresh_img, args.iters)

    # isolated MDP-solve kernels on a fresh reward-shaped map
    rng_np = np.random.default_rng(0)
    r0 = jnp.asarray(rng_np.normal(size=(B, 64, 128, 1)).astype(np.float32))

    @jax.jit
    def vi_only(r):
        v, policy, q = value_iteration(r)
        return v

    @jax.jit
    def vi_policy_svf(r):
        v, policy, q = value_iteration(r)
        s0 = jnp.full((B,), 64 * 128 // 2, jnp.int32)
        s1 = jnp.full((B,), 64 * 128 // 2 + 40, jnp.int32)
        mu = expected_svf(policy, s0, s1, 50, zero_terminal_state=True)
        return mu

    results["vi_only_ms"] = timed(vi_only,
                                  lambda i: (r0 + jnp.float32(i) * 1e-4,),
                                  args.iters)
    results["vi_policy_svf_ms"] = timed(vi_policy_svf,
                                        lambda i: (r0 + jnp.float32(i) * 1e-4,),
                                        args.iters)

    # finer attribution of the loss/backward tail: fwd+loss with NO grad,
    # value_and_grad WITHOUT the gradient penalty (reward_weight=0 closure),
    # and the bare optimizer update on ready-made grads
    closure = pipelines.make_loss_closure("traversability", model, lm)

    @jax.jit
    def fwd_loss(p, bs, b, r):
        total, _ = closure(p, bs, b, r)
        return total

    grad_fn = jax.jit(jax.value_and_grad(closure, has_aux=True))

    lm_nopen = type(lm)(
        {**cfg.to_dict(),
         "loss": [
             {**lc, "reward_weight": 0.0} if lc.get("name") == "MaxEntIRLLoss"
             else lc
             for lc in cfg.to_dict()["loss"]
         ]}
    )
    closure_np = pipelines.make_loss_closure("traversability", model, lm_nopen)
    grad_fn_np = jax.jit(jax.value_and_grad(closure_np, has_aux=True))

    # tree_map, not per-key asarray: counterfactuals_label is a dict
    hb = jax.tree_util.tree_map(jnp.asarray, batch)

    def fresh_batch(i):
        b = dict(hb)
        b["image"] = hb["image"] + jnp.float32(i) * 1e-4
        return (state.params, state.batch_stats, b, rng)

    results["fwd_loss_ms"] = timed(fwd_loss, fresh_batch, args.iters)
    results["grad_ms"] = timed(lambda *a: grad_fn(*a)[1], fresh_batch,
                               args.iters)
    results["grad_nopenalty_ms"] = timed(lambda *a: grad_fn_np(*a)[1],
                                         fresh_batch, args.iters)

    (_, _), g0 = grad_fn(*fresh_batch(0))

    @jax.jit
    def opt_only(g, opt_state, params):
        updates, new_opt = tx.update(g, opt_state, params)
        import optax

        return optax.apply_updates(params, updates)

    results["opt_only_ms"] = timed(
        opt_only,
        lambda i: (jax.tree_util.tree_map(lambda x: x + i * 1e-6, g0),
                   state.opt_state, state.params),
        args.iters)

    # full train step, chained state (honest end-to-end)
    cur = state
    step(cur, sb, rng)
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        cur, metrics = step(cur, sb, jax.random.fold_in(rng, i))
        jax.block_until_ready((cur, metrics))
        ts.append(time.perf_counter() - t0)
    results["full_step_ms"] = float(np.percentile(ts, 50)) * 1e3

    results["mdp_solve_ms"] = results["fwd_mdp_ms"] - results["fwd_nomdp_ms"]
    results["loss_bwd_opt_ms"] = results["full_step_ms"] - results["fwd_mdp_ms"]
    results["loss_only_ms"] = results["fwd_loss_ms"] - results["fwd_mdp_ms"]
    results["bwd_ms"] = results["grad_ms"] - results["fwd_loss_ms"]
    results["penalty_ms"] = results["grad_ms"] - results["grad_nopenalty_ms"]
    for k, v in results.items():
        print(f"{k:>20}: {v:8.1f}")


if __name__ == "__main__":
    main()
