#!/bin/bash
# Round-3 TPU experiment queue: run serially once the tunnel is back.
# Usage: bash scripts/r3_tpu_queue.sh [logfile]
set -u
LOG=${1:-/tmp/r3_queue.log}
cd /root/repo
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1200 "$@" 2>&1 | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 0. tunnel alive?
timeout 90 python -c "import jax,jax.numpy as jnp; print('tunnel OK', float(jnp.ones((8,8)).sum()))" \
  2>&1 | tail -1 | tee -a "$LOG" || exit 1

# 1. bf16 control at B=256 (kernel signature changed: unit-scale epilogue)
MMB_BENCH_BATCH=256 run python -u bench.py
# 2. int8 trunk A/B at B=256
MMB_BENCH_BATCH=256 MMB_TRUNK_INT8=1 run python -u bench.py
# 3. int8 at the B=1024 operating point
MMB_TRUNK_INT8=1 run python -u bench.py
# 4. bf16 at B=2048 (batch-as-args unlocks it)
MMB_BENCH_BATCH=2048 run python -u bench.py
# 5. int8 at B=2048
MMB_BENCH_BATCH=2048 MMB_TRUNK_INT8=1 run python -u bench.py
# 6. K-shape int8 MXU rates (grouped-conv dots)
run python -u scripts/perf_int8_k128.py
# 7. XLA-only int8 rate (ViT lever)
run python -u scripts/perf_xla_int8.py
# 8. device trace of the int8 step (B=256): where does the time go now?
MMB_TRUNK_INT8=1 run python -u scripts/profile_step.py /tmp/trace_int8

echo "QUEUE DONE" | tee -a "$LOG"
