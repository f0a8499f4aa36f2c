#!/bin/bash
# Round-3 TPU queue 10: follow-ups contingent on queue 9's one-band banded
# results — the L1+L2 one-band combo (both stages at zero halo recompute),
# batch amortization on top, stem C_in-pad stacking, and one ViT fused-attn
# retry now that padseq fixes the token-axis tile alignment the round-2
# kernel was penalized for. Starts after queue 9.
set -u
LOG=${1:-/tmp/r3_queue10.log}
Q9LOG=${2:-/tmp/r3_queue9.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue9..." | tee -a "$LOG"
until grep -q "QUEUE9 DONE" "$Q9LOG" 2>/dev/null; do sleep 120; done
echo "queue9 done; starting $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. both one-band stages together (queue 9 measures each alone)
run MMB_HWBC_VMEM=120 MMB_TRUNK_PLAN=banded56,banded28,split,full python -u bench.py
# 2. the combo + batch amortization
run MMB_HWBC_VMEM=120 MMB_TRUNK_PLAN=banded56,banded28,split,full MMB_BENCH_BATCH=1536 python -u bench.py
# 3. L2-only one-band + amortization (fallback if banded56 L1 OOMs)
run MMB_HWBC_VMEM=120 MMB_TRUNK_PLAN=banded28,banded28,split,full MMB_BENCH_BATCH=1536 python -u bench.py
# 4. stem C_in-pad stacked on the combo (front-end lever is independent)
run MMB_STEM_CPAD=1 MMB_HWBC_VMEM=120 MMB_TRUNK_PLAN=banded56,banded28,split,full python -u bench.py
# 5. ViT: fused attention retry under padseq token-tile alignment
run MMB_VIT_PADSEQ=auto MMB_VIT_LNFOLD=1 MMB_FUSED_ATTN=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE10 DONE" | tee -a "$LOG"
