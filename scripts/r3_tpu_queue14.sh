#!/bin/bash
# Round-3 TPU queue 14: re-run of the queue-13 A/Bs (machine restart ate
# the logs before results landed). splitbandN = head block alone +
# one-band banded tail (zero halo recompute without the head conv1's
# VMEM spike), plus the ViT pair-packed attention kernel.
set -u
LOG=${1:-/tmp/r3_queue14.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 0. control: committed defaults, fresh run on this machine
run python -u bench.py
# 1. L2 splitband: head block + one-band 3-block tail
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=banded28,splitband28,split,full python -u bench.py
# 2. L1 splitband too (2-block one-band tail at 56x56)
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=splitband56,splitband28,split,full python -u bench.py
# 3. the L2 splitband + batch amortization
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=banded28,splitband28,split,full MMB_BENCH_BATCH=1536 python -u bench.py
# 4. ViT: layout-native pair-packed attention (MMB_FUSED_ATTN=pairs)
run MMB_FUSED_ATTN=pairs python -u scripts/perf_vit_flagship.py
# 5. pairs + int8 Denses (the one prior ViT win)
run MMB_FUSED_ATTN=pairs MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE14 DONE" | tee -a "$LOG"
