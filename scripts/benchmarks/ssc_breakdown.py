"""Stage-2 (SSC) train-step breakdown at the production B=16 shape.

VERDICT r4 #3: the bf16 stage-2 step runs at ~29% MFU (440.5 ms @ B=16,
57.5 TFLOP/s, intensity 170 — compute-limited, NOT bandwidth) with no
per-phase attribution. This is the irl_breakdown analog for stage 2: it
splits the step into forward trunk / splat+decoder forward / per-loss
costs / backward / optimizer so the optimization effort lands on the
measured top phase (reference step: creste/train_ssc.py Lightning
training_step over TerrainNet + the 6-loss stack,
terrainnet_supcon_sam2dynelev_jointdinopretrain.yaml:92-135).

Phases (all timed with fresh perturbed inputs; the axon tunnel memoizes
(program, args) — see runtime/benchmark.py):

  fwd_backbone    DistillationBackbone fwd (EffNet trunk + depth + dino)
  fwd_full        TerrainNet fwd train=True (+ splat + BEV decoder)
  fwd_loss        + the full 6-loss stack, no grad
  grad            value_and_grad (the real backward)
  grad_no_supcon  backward with SupPixelConLoss removed
  grad_no_distill backward with the dino MSE distillation loss removed
  opt_only        optimizer update on ready-made grads
  full_step       chained-state end-to-end step (the honest number)

Derived: splat_decoder_fwd = fwd_full - fwd_backbone; losses = fwd_loss -
fwd_full; bwd = grad - fwd_loss; supcon_cost = grad - grad_no_supcon;
distill_cost = grad - grad_no_distill.

Usage: python scripts/benchmarks/ssc_breakdown.py [--batch 16]
       [--iters 10] [--dtype float32|bfloat16]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import time

import numpy as np


# per-process salt: the axon tunnel memoizes (program, args) ACROSS
# processes (runtime/benchmark.py) — deterministic perturbations would
# replay into the cache on a rerun of this tool
_SALT = np.float32(((_os.getpid() ^ time.time_ns()) % 997) * 1e-7)


def _fence(out):
    """Materialize a value: block_until_ready is intermittently lazy on
    the tunnel (CLAUDE.md) — only a D2H fetch always fences."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    # index first, then fetch: float() D2Hs ONE element instead of
    # np.asarray()'s whole-array transfer skewing the timing
    return float(leaf.reshape(-1)[0])


def timed(fn, make_args, iters):
    fn(*make_args(0))  # compile
    ts = []
    for i in range(1, iters + 1):
        a = make_args(i)
        t0 = time.perf_counter()
        _fence(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
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
    from creste_public_tpu.models.distillation import DistillationBackbone
    from creste_public_tpu.models.terrainnet import TerrainNet
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch
    from creste_public_tpu.training import pipelines

    B = args.batch
    cfg = presets.terrainnet_model_config()
    if args.dtype != "float32":
        cfg["compute_dtype"] = args.dtype
    cfg["batch_size"] = B

    ds = SyntheticCodaDataset(length=B)
    batch = collate([ds[i] for i in range(B)])
    batch = {k: v for k, v in batch.items()
             if k not in ("counterfactuals_label",)}

    mesh = make_mesh()
    model, lm, state, tx = pipelines.init_stage(
        "ssc", cfg,
        jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch),
        steps_per_epoch=100,
    )
    step = pipelines.make_train_step("ssc", model, lm, tx, mesh,
                                     task="joint", donate=False)
    sb = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rgbd = jnp.asarray(batch["image"])
    p2p = jnp.asarray(batch["p2p"])

    cfg_dict = cfg.to_dict()
    tnet = TerrainNet(cfg_dict)
    dback = DistillationBackbone(cfg_dict)

    @jax.jit
    def fwd_backbone(v, x):
        dv = {"params": v["params"]["depthcomp"],
              "batch_stats": v["batch_stats"].get("depthcomp", {})}
        out, _ = dback.apply(dv, x, p2p, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": rng})
        return out["depth_preds_metric"]

    @jax.jit
    def fwd_full(v, x):
        out, _ = tnet.apply(v, x, p2p, None, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": rng,
                                  "noise": jax.random.fold_in(rng, 7)})
        return out["inpainting_sam_preds"]

    def fresh_img(i):
        return (variables, rgbd + jnp.float32(i) * 1e-4 + _SALT)

    results = {}
    results["fwd_backbone_ms"] = timed(fwd_backbone, fresh_img, args.iters)
    results["fwd_full_ms"] = timed(fwd_full, fresh_img, args.iters)

    # loss variants: full stack, without SupCon, without dino distillation
    def lm_without(name):
        from creste_public_tpu.losses.manager import LossManager

        return LossManager({**cfg_dict, "loss": [
            lc for lc in cfg_dict["loss"] if lc["name"] != name]})

    closure = pipelines.make_loss_closure("ssc", model, lm, task="joint")
    closure_nosc = pipelines.make_loss_closure(
        "ssc", model, lm_without("SupPixelConLoss"), task="joint")
    closure_nomse = pipelines.make_loss_closure(
        "ssc", model, lm_without("MSELoss"), task="joint")

    @jax.jit
    def fwd_loss(p, bs, b, r):
        total, _ = closure(p, bs, b, r)
        return total

    grad_fn = jax.jit(jax.value_and_grad(closure, has_aux=True))
    grad_nosc = jax.jit(jax.value_and_grad(closure_nosc, has_aux=True))
    grad_nomse = jax.jit(jax.value_and_grad(closure_nomse, has_aux=True))

    hb = jax.tree_util.tree_map(jnp.asarray, batch)

    def fresh_batch(i):
        b = dict(hb)
        b["image"] = hb["image"] + jnp.float32(i) * 1e-4 + _SALT
        return (state.params, state.batch_stats, b, rng)

    results["fwd_loss_ms"] = timed(fwd_loss, fresh_batch, args.iters)
    results["grad_ms"] = timed(lambda *a: grad_fn(*a)[1], fresh_batch,
                               args.iters)
    results["grad_no_supcon_ms"] = timed(lambda *a: grad_nosc(*a)[1],
                                         fresh_batch, args.iters)
    results["grad_no_distill_ms"] = timed(lambda *a: grad_nomse(*a)[1],
                                          fresh_batch, args.iters)

    (_, _), g0 = grad_fn(*fresh_batch(0))

    # salt INSIDE the jitted fn: perturbing every gradient leaf eagerly in
    # make_args sprays hundreds of per-leaf tunnel RPCs that the fence then
    # waits on (the round-5 first-cut probe measured 738 ms for a ~5 ms
    # optimizer this way)
    @jax.jit
    def opt_only(g, opt_state, params, salt):
        import optax

        g = jax.tree_util.tree_map(lambda x: x + salt, g)
        updates, new_opt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates)

    results["opt_only_ms"] = timed(
        opt_only,
        lambda i: (g0, state.opt_state, state.params,
                   jnp.float32(i) * 1e-6 + _SALT),
        args.iters)

    # full train step, chained state (honest end-to-end)
    cur = state
    step(cur, sb, rng)
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        cur, metrics = step(cur, sb, jax.random.fold_in(rng, i))
        float(metrics["loss"])  # D2H value fence (lazy block_until_ready)
        ts.append(time.perf_counter() - t0)
    results["full_step_ms"] = float(np.percentile(ts, 50)) * 1e3

    results["splat_decoder_fwd_ms"] = (
        results["fwd_full_ms"] - results["fwd_backbone_ms"])
    results["losses_fwd_ms"] = results["fwd_loss_ms"] - results["fwd_full_ms"]
    results["bwd_ms"] = results["grad_ms"] - results["fwd_loss_ms"]
    results["supcon_cost_ms"] = (
        results["grad_ms"] - results["grad_no_supcon_ms"])
    results["distill_cost_ms"] = (
        results["grad_ms"] - results["grad_no_distill_ms"])
    print(f"# stage-2 breakdown  B={B} dtype={args.dtype}")
    for k, v in results.items():
        print(f"{k:>24}: {v:8.1f}")
    print(f"{'samples_per_s':>24}: {B * 1000.0 / results['full_step_ms']:8.1f}")


if __name__ == "__main__":
    main()
