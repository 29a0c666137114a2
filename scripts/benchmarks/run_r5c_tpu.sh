#!/usr/bin/env bash
# Round-5 TPU measurement queue, part 3 — resume of run_r5b_tpu.sh after the
# session died mid-sweep. bench_b8 completed there (132.64 Hz single-frame /
# 128.48 fps @ B=8, HBM 62.4%); the items below are still owed.
# Ordered cheap+high-value first in case the tunnel is slow again.
#
# Usage: bash scripts/benchmarks/run_r5c_tpu.sh [outfile]
set -u
OUT="${1:-/tmp/r5c_tpu_sweep.log}"
cd "$(dirname "$0")/../.."

run() {
  name="$1"; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  timeout "$@" >>"$OUT" 2>&1
  echo "--- $name exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# 1. native host streaming on the real chip (VERDICT r4 #2): sequential vs
#    --pipeline on the round-5 production artifact (cheap: 24 s compile)
GEN="${PALLAS_AXON_TPU_GEN:-v5e}"
export AXON_POOL_SVC_OVERRIDE="${AXON_POOL_SVC_OVERRIDE:-127.0.0.1}"
export TPU_WORKER_HOSTNAMES="${TPU_WORKER_HOSTNAMES:-localhost}"
ART="${NATIVE_ARTIFACT:-/tmp/r5/native_artifact}"
if [ -d "$ART" ] && [ -x native/build/creste_serve ]; then
  for depth in 2 4; do
    run "native_pipeline$depth" 2400 native/build/creste_serve \
      --plugin /opt/axon/libaxon_pjrt.so --artifact "$ART" \
      --iters 30 --warmup 3 --distinct 8 --pipeline "$depth" \
      --copt "topology=$GEN:1x1x1" --copt "session_id=r5c-$depth-$$" \
      --copt n_slices=1 --copt remote_compile=1 --copt local_only=0 \
      --copt priority=0 --copt rank=4294967295
  done
else
  echo "native artifact or host missing — skipping" | tee -a "$OUT"
fi

# 2. batched serving at B=16 (VERDICT #1 tail; B=8 is on file)
run bench_b16 3600 python bench.py --batch 16

# 3. stage-2 step breakdown, bf16 first (the 29% MFU mystery), then f32
run ssc_breakdown_bf16 7200 python scripts/benchmarks/ssc_breakdown.py \
  --dtype bfloat16
run ssc_breakdown_f32 7200 python scripts/benchmarks/ssc_breakdown.py

# 4. stage-3 bf16 parity ledger at production size (VERDICT #4a tail)
run irl_parity 3600 python scripts/benchmarks/irl_bf16_parity.py \
  --batch 10 --steps 50

# 5. bf16 + fold-bn deviation for the ledger (VERDICT #4a tail)
run bench_fold 3600 python bench.py --bf16 --fold-bn

tail -n +1 "$OUT"
