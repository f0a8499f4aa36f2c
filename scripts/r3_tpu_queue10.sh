#!/bin/bash
# Round-3 TPU queue 10 (REWRITTEN after queue-9 OOM data): the one-band
# whole-stage combos are dead — banded56 L1 needs 158.3M and
# banded28-L2 165.1M of the 128M physical VMEM, so no cap can admit
# them. Reclaimed slots: splitband A/Bs (head block + one-band tail,
# fits VMEM by construction), an L3 whole-stage-with-head A/B, the ViT
# fused-attention-under-padseq retry, and a bench dispatch-amortization
# A/B (50-step scan x 1 call vs 10 x 5 — same program, fewer tunnel
# RTT boundaries).
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

# 1. L2 splitband: head block + one-band 3-block tail (zero recompute,
#    no head-conv1 VMEM spike)
run MMB_TRUNK_PLAN=banded28,splitband28,split,full python -u bench.py
# 2. L3 whole-stage WITH head ("full") — never measured; saves the
#    head-out/tail-in pass (L4 full already won this way)
run MMB_TRUNK_PLAN=banded28,blocks,full,full python -u bench.py
# 3. both new levers together
run MMB_TRUNK_PLAN=banded28,splitband28,full,full python -u bench.py
# 4. dispatch amortization: one 50-step scan call (same math, fewer
#    tunnel RTT boundaries in the timed region)
run MMB_BENCH_STEPS=50 MMB_BENCH_CALLS=1 python -u bench.py
# 5. ViT: fused attention retry under padseq token-tile alignment
run MMB_VIT_PADSEQ=auto MMB_VIT_LNFOLD=1 MMB_FUSED_ATTN=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE10 DONE" | tee -a "$LOG"
