"""Headline benchmark: single-frame RGB-D -> BEV reward inference rate.

Reference baseline: 20 Hz end-to-end on a laptop GPU (README.md:18); the
north-star for this build is >=100 Hz/chip on TPU v5e (BASELINE.json).
Runs the deployment graph (MaxEntIRL with solve_mdp=False — the same graph
the reference exports via torch.jit.trace, compile.py:170-210) at the
production shape [1, 1, 4, 512, 612].

Measurement methodology (IMPORTANT): the axon tunnel runtime memoizes
(program, arguments) executions, so naive timing loops over identical
inputs report cache hits, not compute (round-1's 1064 Hz headline was this
artifact). The honest metric here is ON-CHIP SERIALIZED latency: the model
is run inside lax.scan with an output-feedback input perturbation (each
iteration depends on the previous output, so nothing can be deduped,
reordered, or pipelined), on a FRESH device-resident input per timed call;
per-frame latency = (T_scan(N) - T_scan(1)) / (N - 1), which also cancels
the per-call tunnel/RPC overhead (~30-45 ms here, irrelevant to real
robot deployment where the host is directly attached).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N, ...}
"""
from __future__ import annotations

import argparse
import json

from creste_public_tpu.runtime.benchmark import (
    cost_stats,
    mfu_fields,
    serialized_latency,
)

BASELINE_HZ = 20.0  # reference: 20 Hz on a laptop GPU (README.md:18)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true",
                    help="also benchmark bfloat16-cast weights and report "
                         "the reward-map deviation vs f32 (opt-in: not "
                         "parity-compatible)")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="also benchmark the fused Pallas reward head. "
                         "RETIRED from the default: measured END-TO-END "
                         "REGRESSION on v5e (92.2 Hz BENCH_r03 / 92.8 Hz "
                         "round-4 re-measure, vs 130.6-131.4 Hz plain XLA) "
                         "— the flax head is only ~107 us of the 7.6 ms "
                         "frame (reward_head_bench.py), so the 'op-launch-"
                         "bound' premise was wrong for TPU/XLA and the "
                         "custom call just breaks fusion around it. Kept "
                         "opt-in; parity-safe (dev 2.6e-4, BN-fold only)")
    ap.add_argument("--fold-bn", action="store_true",
                    help="also benchmark whole-graph inference BN folding "
                         "(every BatchNorm -> one per-channel multiply-add "
                         "at trace time; same checkpoint). MEASURED NO-OP "
                         "on v5e (130.3 Hz f32 / 145.7 Hz bf16 vs "
                         "131.6 / 146.9 unfolded, within noise): XLA "
                         "already fuses the inference BN math into the "
                         "surrounding convs, so there are no islands left "
                         "to remove. Kept opt-in as evidence")
    ap.add_argument("--merge-heads", action="store_true",
                    help="also benchmark the block-diagonal merged decoder "
                         "tail (the 3 DeconvHeads as grouped convs — exact "
                         "numerics, 1/3 the decoder-tail op count; the "
                         "round-4 small-op-floor lever, VERDICT r4 #4b). "
                         "Composes with --bf16")
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure offline/serving throughput at "
                         "batch N (frames/s; amortises per-launch "
                         "overheads the single-frame latency path pays)")
    args = ap.parse_args()
    if args.batch == 1:
        # validate BEFORE any measurement so a bad flag can't discard a
        # session's worth of tunnel compiles
        ap.error("--batch must be >= 2 (B=1 IS the headline measurement)")

    import jax

    from __graft_entry__ import entry
    from creste_public_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    fn, (variables, rgbd, p2p) = entry()
    per_frame, single_call = serialized_latency(
        fn, variables, rgbd, p2p, "traversability_preds"
    )
    hz = 1.0 / per_frame

    line = {
        "metric": "single-frame RGBD->BEV reward inference rate "
                  "(on-chip serialized)",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
        "per_frame_ms": round(per_frame * 1e3, 3),
        "tunnel_call_ms": round(single_call * 1e3, 2),
    }

    # MFU / roofline accounting (VERDICT r2 #3): analytical FLOPs + bytes
    # from the compiled executable vs the measured latency.
    try:
        cs = cost_stats(fn, variables, rgbd, p2p)
        line.update(mfu_fields(cs["flops"], cs["bytes"], per_frame))
    except Exception as e:  # cost_analysis unavailable on some backends
        line["cost_analysis_error"] = str(e)[:120]

    def variant(name, body):
        # a variant failure (e.g. a Pallas compile issue on new hardware)
        # must not lose the headline measurement
        try:
            body()
        except Exception as e:
            line[f"{name}_error"] = str(e)[:160]

    # one f32 reference output, compiled once, shared by every variant's
    # deviation check (each jax.jit(fn) wrapper would recompile the full
    # production graph — minutes over the tunnel)
    out_f32 = None
    if args.fused or args.bf16 or args.fold_bn or args.merge_heads:
        out_f32 = jax.jit(fn)(variables, rgbd, p2p)

    if args.merge_heads:
        from creste_public_tpu.runtime.precision import max_abs_deviation

        def run_merged():
            fnM, (vM, _, _) = entry(merge_heads=True, variables=variables)
            per_M, _ = serialized_latency(
                fnM, vM, rgbd, p2p, "traversability_preds"
            )
            out_M = jax.jit(fnM)(vM, rgbd, p2p)
            line["merge_heads_hz"] = round(1.0 / per_M, 2)
            line["merge_heads_reward_max_dev"] = round(max_abs_deviation(
                out_f32["traversability_preds"],
                out_M["traversability_preds"]), 8)

        variant("merge_heads", run_merged)

        if args.bf16:
            def run_merged_bf16():
                from creste_public_tpu.runtime.precision import (
                    cast_variables,
                )

                fnM16, (vM, _, _) = entry(
                    compute_dtype="bfloat16", merge_heads=True,
                    variables=variables)
                vM16 = cast_variables(vM)
                per_M16, _ = serialized_latency(
                    fnM16, vM16, rgbd, p2p, "traversability_preds"
                )
                out_M16 = jax.jit(fnM16)(vM16, rgbd, p2p)
                line["bf16_merge_heads_hz"] = round(1.0 / per_M16, 2)
                line["bf16_merge_heads_reward_max_dev"] = round(
                    max_abs_deviation(
                        out_f32["traversability_preds"],
                        out_M16["traversability_preds"]), 6)

            variant("bf16_merge_heads", run_merged_bf16)

    if args.fold_bn:
        from creste_public_tpu.runtime.precision import max_abs_deviation

        def run_fold():
            fnF, _ = entry(fold_bn=True, variables=variables)
            per_F, _ = serialized_latency(
                fnF, variables, rgbd, p2p, "traversability_preds"
            )
            out_F = jax.jit(fnF)(variables, rgbd, p2p)
            line["fold_bn_hz"] = round(1.0 / per_F, 2)
            line["fold_bn_reward_max_dev"] = round(max_abs_deviation(
                out_f32["traversability_preds"],
                out_F["traversability_preds"]), 8)

        variant("fold_bn", run_fold)

    if args.fused:
        from creste_public_tpu.runtime.precision import max_abs_deviation

        def run_fused():
            fnf, _ = entry(fused_reward=True, variables=variables)
            per_f, _ = serialized_latency(
                fnf, variables, rgbd, p2p, "traversability_preds"
            )
            out_fused = jax.jit(fnf)(variables, rgbd, p2p)
            line["fused_hz"] = round(1.0 / per_f, 2)
            line["fused_reward_max_dev"] = round(max_abs_deviation(
                out_f32["traversability_preds"],
                out_fused["traversability_preds"]), 8)

        variant("fused", run_fused)

    if args.bf16:
        from creste_public_tpu.runtime.precision import (
            cast_variables,
            max_abs_deviation,
        )

        vb = cast_variables(variables)

        def run_bf16():
            # mixed-precision graph: bf16 activation stream + bf16 weights,
            # f32 geometry islands (stem/BN/depth-head/splat accumulator)
            fn16, _ = entry(compute_dtype="bfloat16", variables=variables)
            per_bf16, _ = serialized_latency(
                fn16, vb, rgbd, p2p, "traversability_preds"
            )
            out_bf16 = jax.jit(fn16)(vb, rgbd, p2p)
            dev = max_abs_deviation(out_f32["traversability_preds"],
                                    out_bf16["traversability_preds"])
            line["bf16_hz"] = round(1.0 / per_bf16, 2)
            line["bf16_reward_max_dev"] = round(dev, 6)
            cs16 = cost_stats(fn16, vb, rgbd, p2p)
            line.update({f"bf16_{k}": v for k, v in mfu_fields(
                cs16["flops"], cs16["bytes"], per_bf16).items()})

        variant("bf16", run_bf16)

    if args.bf16 and args.fold_bn:
        def run_bf16_fold():
            # the composed opt-in fast path: bf16 activation stream AND
            # folded BNs (no f32 norm islands left between the convs)
            fnBF, _ = entry(compute_dtype="bfloat16", fold_bn=True,
                            variables=variables)
            per_BF, _ = serialized_latency(
                fnBF, vb, rgbd, p2p, "traversability_preds"
            )
            out_BF = jax.jit(fnBF)(vb, rgbd, p2p)
            line["bf16_fold_bn_hz"] = round(1.0 / per_BF, 2)
            line["bf16_fold_bn_reward_max_dev"] = round(max_abs_deviation(
                out_f32["traversability_preds"],
                out_BF["traversability_preds"]), 6)
            cs = cost_stats(fnBF, vb, rgbd, p2p)
            line.update({f"bf16_fold_bn_{k}": v for k, v in mfu_fields(
                cs["flops"], cs["bytes"], per_BF).items()})

        variant("bf16_fold_bn", run_bf16_fold)

    if args.batch and args.batch > 1:
        def run_batch():
            fnB, (_, rgbdB, p2pB) = entry(variables=variables,
                                          batch=args.batch)
            per_step, _ = serialized_latency(
                fnB, variables, rgbdB, p2pB, "traversability_preds"
            )
            line["batch"] = args.batch
            line["batch_fps"] = round(args.batch / per_step, 2)
            csb = cost_stats(fnB, variables, rgbdB, p2pB)
            line.update({f"batch_{k}": v for k, v in mfu_fields(
                csb["flops"], csb["bytes"], per_step).items()})

        variant("batch", run_batch)

        if args.bf16:
            def run_bf16_batch():
                # composed serving mode: the B>1 graph is COMPUTE-bound
                # (per-frame bytes drop as weights amortise — intensity
                # 134 vs 95 at B=8, above the f32 ridge), so the bf16
                # MXU rate is the one lever batching leaves open
                fnB16, (_, rgbdB, p2pB) = entry(
                    compute_dtype="bfloat16", variables=variables,
                    batch=args.batch)
                per16, _ = serialized_latency(
                    fnB16, vb, rgbdB, p2pB, "traversability_preds"
                )
                line["bf16_batch_fps"] = round(args.batch / per16, 2)
                cs16b = cost_stats(fnB16, vb, rgbdB, p2pB)
                line.update({f"bf16_batch_{k}": v for k, v in mfu_fields(
                    cs16b["flops"], cs16b["bytes"], per16).items()})

            variant("bf16_batch", run_bf16_batch)

    if args.bf16 and args.fused:
        def run_bf16_fused():
            # combined opt-in deployment mode: bf16 activation stream on
            # the bandwidth-bound backbone + fused Pallas reward head on
            # the launch-bound tail (the fold upcasts its params to f32,
            # so the head stays an f32 island under the cast weight tree)
            fnb, _ = entry(compute_dtype="bfloat16", fused_reward=True,
                           variables=variables)
            per_b, _ = serialized_latency(
                fnb, vb, rgbd, p2p, "traversability_preds"
            )
            out_b = jax.jit(fnb)(vb, rgbd, p2p)
            line["bf16_fused_hz"] = round(1.0 / per_b, 2)
            line["bf16_fused_reward_max_dev"] = round(max_abs_deviation(
                out_f32["traversability_preds"],
                out_b["traversability_preds"]), 6)

        variant("bf16_fused", run_bf16_fused)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
