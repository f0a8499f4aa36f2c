#!/bin/bash
# Round-3 TPU queue 6: int8-TRANSPORT trunk A/B.
# Transport = activations cross HBM as int8 (half the DMA bytes — the
# binding constraint on layers 1-2 per BENCH_NOTES) while every dot
# stays bf16 (no Mosaic int8-dot penalty, no h1/h2 requant epilogues).
# Control (committed default): MMB_TRUNK_INT8=0,0,1,1 = 10757 pairs/s.
set -u
LOG=${1:-/tmp/r3_queue6.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 1800 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. control re-run (tunnel-day variance anchor)
run python -u bench.py
# 2. transport L1/L2 (banded28 L1 stays banded in transport), q L3/L4
run MMB_TRUNK_INT8=t,t,1,1 python -u bench.py
# 3. transport everywhere (is the int8 MXU rate on L3/L4 still needed?)
run MMB_TRUNK_INT8=t,t,t,t python -u bench.py
# 4. transport L1/L2 with banded14 L1 (VMEM headroom variant: bsub=32
#    doubles the per-cell footprint; banded28 may exceed the budget)
run MMB_TRUNK_INT8=t,t,1,1 MMB_TRUNK_PLAN=banded14,blocks,split,full \
  python -u bench.py
# 5. banded L2 under transport (bf16 banded L2 lost to blocks; the
#    cost ratio changes when activations are int8)
run MMB_TRUNK_INT8=t,t,1,1 MMB_TRUNK_PLAN=banded28,banded14,split,full \
  python -u bench.py
echo "QUEUE6 DONE" | tee -a "$LOG"
