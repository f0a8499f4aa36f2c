#!/bin/bash
# Round-3 TPU queue 15: reprioritized after queue-14 showed splitband28
# L2 LOSES (10,204 vs 10,589 control). Re-measures the two levers whose
# queue-9/10 results were lost to the machine restart — B=1536
# amortization and the stem C_in-pad (both projected contributors to the
# ~5x stack) — plus the ViT pair-packed attention A/Bs from queue 13.
set -u
LOG=${1:-/tmp/r3_queue15.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. batch amortization on the committed plan
run MMB_BENCH_BATCH=1536 python -u bench.py
# 2. stem C_in-pad (7x7 conv K 147->256-aligned, exact)
run MMB_STEM_CPAD=1 python -u bench.py
# 3. the combo (if both win or either is ~neutral)
run MMB_STEM_CPAD=1 MMB_BENCH_BATCH=1536 python -u bench.py
# 4. ViT: layout-native pair-packed attention
run MMB_FUSED_ATTN=pairs python -u scripts/perf_vit_flagship.py
# 5. pairs + int8 Denses (the one prior ViT win)
run MMB_FUSED_ATTN=pairs MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE15 DONE" | tee -a "$LOG"
