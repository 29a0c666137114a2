#!/usr/bin/env bash
# One-shot TPU measurement sweep: runs every pending benchmark in priority
# order, appending each tool's output to $OUT (default /tmp/tpu_sweep.log).
# Designed for the flaky axon tunnel — each step is independently
# timeout-bounded and a failure does not stop the sweep.
#
# Usage: bash scripts/benchmarks/run_all_tpu.sh [outfile]
set -u
OUT="${1:-/tmp/tpu_sweep.log}"
cd "$(dirname "$0")/../.."

run() {
  name="$1"; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  timeout "$@" >>"$OUT" 2>&1
  echo "--- $name exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# 1. headline + fused (bench defaults) — keep this invocation smallest so
#    a tunnel stall can't cost the headline; variants go in their own
#    timeout-bounded processes (each prints its own JSON line)
run headline 3600 python bench.py
run variants_bf16 3600 python bench.py --bf16
run variants_fold 3600 python bench.py --bf16 --fold-bn
run variants_batch 2400 python bench.py --batch 8

# 2. SVF propagation micro-benchmark (XLA scan vs pallas)
run svf 1800 python scripts/benchmarks/svf_bench.py

# 3. stage-2 train step, f32 then real bf16 stream (round-3 re-measure)
run train_f32 2400 python scripts/benchmarks/train_step_bench.py --batch 16
run train_bf16 2400 python scripts/benchmarks/train_step_bench.py \
  --batch 16 --dtype bfloat16

# 4. stage-3 IRL step (pallas VI + pallas SVF dispatch), f32 then the
#    bf16-frozen-backbone mode, plus the phase breakdown
run train_irl 2400 python scripts/benchmarks/train_step_bench.py \
  --stage traversability --batch 10
run train_irl_bf16 2400 python scripts/benchmarks/train_step_bench.py \
  --stage traversability --batch 10 --dtype bfloat16
run irl_breakdown 2400 python scripts/benchmarks/irl_breakdown.py

# 5. offline preprocessing kernel chain at production shapes
run preproc 1800 python scripts/benchmarks/preproc_bench.py

tail -n +1 "$OUT"
