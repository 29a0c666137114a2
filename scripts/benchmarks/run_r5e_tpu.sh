#!/usr/bin/env bash
# Round-5 TPU measurement queue, part 5 — follow-ups on the r5c results:
#  1. native host with per-leg seq timing + ASYNC H2D staging in the
#     pipelined phase (H2Ds ride the wire while the previous frame
#     executes/fences) — depths 2/4/8 to find the overlap ceiling
#  2. SupCon phase attribution at the production stage-2 shape (the 65 ms
#     line item in ssc_breakdown: sampling sort vs median sort vs matmul)
#
# Usage: bash scripts/benchmarks/run_r5e_tpu.sh [outfile]
set -u
OUT="${1:-/tmp/r5e_tpu_sweep.log}"
cd "$(dirname "$0")/../.."

run() {
  name="$1"; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  timeout "$@" >>"$OUT" 2>&1
  echo "--- $name exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

GEN="${PALLAS_AXON_TPU_GEN:-v5e}"
export AXON_POOL_SVC_OVERRIDE="${AXON_POOL_SVC_OVERRIDE:-127.0.0.1}"
export TPU_WORKER_HOSTNAMES="${TPU_WORKER_HOSTNAMES:-localhost}"
ART="${NATIVE_ARTIFACT:-/tmp/r5/native_artifact}"
if [ -d "$ART" ] && [ -x native/build/creste_serve ]; then
  for depth in 2 4 8; do
    run "native_async_pipeline$depth" 2400 native/build/creste_serve \
      --plugin /opt/axon/libaxon_pjrt.so --artifact "$ART" \
      --iters 30 --warmup 3 --distinct 8 --pipeline "$depth" \
      --copt "topology=$GEN:1x1x1" --copt "session_id=r5e-$depth-$$" \
      --copt n_slices=1 --copt remote_compile=1 --copt local_only=0 \
      --copt priority=0 --copt rank=4294967295
  done
else
  echo "native artifact or host missing — skipping" | tee -a "$OUT"
fi

run supcon_bench 3600 python scripts/benchmarks/supcon_bench.py \
  --batch 16 --hw 256 --iters 10

tail -n +1 "$OUT"
