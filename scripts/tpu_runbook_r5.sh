#!/bin/bash
# Round-5 TPU measurement runbook (VERDICT r4 #2/#6/#8): regenerate every
# PERFORMANCE.md row at r5 defaults in one sequential pass. Safe to re-run;
# logs under /tmp/runbook5. ONE jax process at a time — stages run serially.
# Usage: bash scripts/tpu_runbook_r5.sh [stage...]   (default: all)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
LOG=/tmp/runbook5
mkdir -p $LOG
stages=${@:-smoke formats gpt2 pipeline prefill b1}

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
formats)
  # b=1 decode across formats at r5 defaults (VERDICT #2/#4: Q6_K/Q5x
  # rows were last measured in r2 before their tune entries landed)
  run bench_q4_0 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q4_0 python bench.py
  run bench_q8_0 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q8_0 python bench.py
  run bench_q4_k_int8kv 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q4_k BENCH_INT8_KV=1 python bench.py
  run bench_q6_k 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q6_k python bench.py
  run bench_q5_0 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q5_0 python bench.py
  run bench_q5_1 1800 env BENCH_CHILD=1 BENCH_MODEL=llama-7b \
    BENCH_FORMAT=q5_1 python bench.py ;;
gpt2)
  # GPT-2 on the r5 engine (VERDICT #8): b=1 decode + serve slots=8
  run bench_gpt2_b1 1800 env BENCH_CHILD=1 BENCH_MODEL=gpt2-124m \
    BENCH_FORMAT=q8_0 python bench.py
  run serve_gpt2 1800 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=gpt2-124m BENCH_FORMAT=q8_0 BENCH_SERVE_SLOTS=8 \
    python bench.py ;;
pipeline)
  # window pipelining A/B (VERDICT #6): depth 1 vs 4 (default) on both
  # model classes, serve slots=8 at the r5 serving defaults
  run serve_7b_p1 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_SERVE_PIPELINE=1 python bench.py
  run serve_7b_p4 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_SERVE_PIPELINE=4 python bench.py
  run serve_7b_w16 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_SERVE_MULTISTEP=16 python bench.py
  run serve_gpt2_p1 1800 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=gpt2-124m BENCH_FORMAT=q8_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_SERVE_PIPELINE=1 python bench.py ;;
scale)
  # serving concurrency curve (r5): the decode step is weight-chain bound,
  # so aggregate scales with slots until KV terms/memory bite. POWER-OF-TWO
  # slots only (24 measured pathological: tile padding + remat thrash);
  # bf16 KV OOMs at 32 slots — INT8 KV unlocks 32-64.
  run serve_7b_s16 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=16 \
    python bench.py
  run serve_7b_s32_int8 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=32 \
    BENCH_INT8_KV=1 python bench.py
  run serve_7b_s64_int8 3000 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=64 \
    BENCH_INT8_KV=1 python bench.py
  run serve_gpt2_s32 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=gpt2-124m BENCH_FORMAT=q8_0 BENCH_SERVE_SLOTS=32 \
    python bench.py
  run serve_gpt2_s64 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=gpt2-124m BENCH_FORMAT=q8_0 BENCH_SERVE_SLOTS=64 \
    python bench.py ;;
serve_extra)
  # glue levers at b=8: MLP megakernel (129->97 pallas calls/step) and a
  # longer window (fetch amortization)
  run serve_7b_mlpfused 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_MLP_FUSED=1 python bench.py
  run serve_7b_w64 2400 env BENCH_CHILD=1 BENCH_MODE=serve \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_SERVE_SLOTS=8 \
    GGML_TPU_SERVE_MULTISTEP=64 python bench.py ;;
prefill)
  run bench_prefill 1800 env BENCH_CHILD=1 BENCH_MODE=prefill \
    BENCH_MODEL=llama-7b BENCH_FORMAT=q4_0 BENCH_PREFILL=512 \
    python bench.py ;;
b1)
  run diag_b1 2400 python scripts/diag_b1.py ;;
*) echo "unknown stage $s" ;;
esac
done
echo "RUNBOOK DONE $(date)" | tee -a $LOG/runbook.log
grep -h '"metric"' $LOG/*.log 2>/dev/null | tee -a $LOG/runbook.log
