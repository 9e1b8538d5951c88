#!/bin/bash
# Round-2 TPU measurement runbook: run the full verification + measurement
# sequence after the relay recovers. Safe to re-run; logs under /tmp/runbook.
# Usage: bash scripts/tpu_runbook.sh [stage...]   (default: all stages)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
LOG=/tmp/runbook
mkdir -p $LOG
# bench A/B before the compile-heavy autotune: on a cold cache each probe
# candidate is its own minutes-long remote compile
stages=${@:-smoke diag bench_ab bench_serve diag_gpt2 autotune}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date)" | tee -a $LOG/runbook.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date)" | tee -a $LOG/runbook.log
  return $rc
}

for s in $stages; do
case $s in
smoke)
  run smoke 3600 python scripts/tpu_smoke.py || {
    echo "SMOKE FAILED — inspect $LOG/smoke.log before trusting defaults" \
      | tee -a $LOG/runbook.log; exit 1; } ;;
diag)
  run diag 2400 python scripts/diag_decode.py ;;
diag_gpt2)
  run diag_gpt2 2400 python scripts/diag_gpt2.py ;;
autotune)
  run autotune 3600 python scripts/autotune_swar.py ;;
bench_ab)
  # A/B the new decode paths on the 7B and 124M workloads
  run bench_7b_fused 2400 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q4_0 python bench.py
  run bench_7b_nofd 2400 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q4_0 GGML_TPU_FLASH_DECODE=0 python bench.py
  run bench_7b_lf 2400 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q4_0 GGML_TPU_LLAMA_FUSED=1 python bench.py
  run bench_gpt2_lf 1800 env BENCH_CHILD=1 BENCH_MODEL=gpt2-124m \
    BENCH_FORMAT=q8_0 python bench.py
  run bench_gpt2_nolf 1800 env BENCH_CHILD=1 BENCH_MODEL=gpt2-124m \
    BENCH_FORMAT=q8_0 GGML_TPU_LAYER_FUSED=0 python bench.py ;;
bench_serve)
  # continuous-batching engine throughput (aggregate tok/s across slots)
  run bench_serve_7b 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    python bench.py
  run bench_serve_gpt2 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=gpt2-124m BENCH_FORMAT=q8_0 BENCH_SERVE_SLOTS=8 \
    python bench.py ;;
*) echo "unknown stage $s" ;;
esac
done
echo "RUNBOOK DONE $(date)" | tee -a $LOG/runbook.log
grep -h '"metric"' $LOG/bench_*.log 2>/dev/null | tee -a $LOG/runbook.log
