#!/usr/bin/env bash
# Round-5 TPU measurement queue (VERDICT r4 next-items), in priority order.
# Each step is timeout-bounded and independent; append-logs to $OUT.
#
# Usage: bash scripts/benchmarks/run_r5_tpu.sh [outfile]
set -u
OUT="${1:-/tmp/r5_tpu_sweep.log}"
cd "$(dirname "$0")/../.."

run() {
  name="$1"; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  timeout "$@" >>"$OUT" 2>&1
  echo "--- $name exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# 1. merged decoder tail + bf16 ledger (VERDICT #4a/#4b)
run bench_merge 3600 python bench.py --merge-heads --bf16

# 2. batched-serving attribution: per-stage B=1 vs B=8 (VERDICT #1)
run batch_stages 3600 python scripts/benchmarks/inference_breakdown.py \
  --batch 8
run batch_hlo 2400 python scripts/benchmarks/hlo_bytes.py --batch 8 --top 30

# 3. stage-2 step breakdown, f32 + bf16 (VERDICT #3)
run ssc_breakdown_bf16 3600 python scripts/benchmarks/ssc_breakdown.py \
  --dtype bfloat16
run ssc_breakdown_f32 3600 python scripts/benchmarks/ssc_breakdown.py

# 4. stage-3 bf16 parity ledger (VERDICT weak #3)
run irl_parity 3600 python scripts/benchmarks/irl_bf16_parity.py

# 5. bf16 + fold-bn deviation for the ledger (VERDICT #4a)
run bench_fold 3600 python bench.py --bf16 --fold-bn

tail -n +1 "$OUT"
