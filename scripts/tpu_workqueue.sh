#!/bin/bash
# Round-4 TPU work queue (PERFNOTES.md "fire in order the moment the tunnel
# answers"). Each step is independently time-boxed and logs to
# runs/r4_tpu/; a step failing does not stop the queue. Usage:
#   bash scripts/tpu_workqueue.sh [outdir]
set -u
OUT=${1:-runs/r4_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  ( timeout "$tmo" "$@" ) > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  tail -3 "$OUT/$name.log"
}

# 1. new-code baseline: fast-conv + pallas-coder on, batch 1
run bench_fast 900 python bench.py
# 2. isolate each kernel's win
run bench_noconv 900 python bench.py --fast-conv 0
run bench_nocoder 900 python bench.py --pallas-coder 0
run bench_allxla 900 python bench.py --fast-conv 0 --pallas-coder 0
# 3. batched-frame scaling
run bench_batch4 1200 python bench.py --batch 4
run bench_batch8 1500 python bench.py --batch 8
# 4. per-scale / per-op attribution of what remains
run scale_profile 1200 python scripts/scale_profile.py
# 5. lossy-family device numbers
run bench_models 2400 python scripts/bench_models.py --models v2,v3,color,v1
echo "=== queue done; logs in $OUT ==="
grep -h '"metric"' "$OUT"/bench_*.log 2>/dev/null
