#!/bin/bash
# Round-3 TPU queue 13: splitbandN A/Bs (head block alone + ONE-band
# banded tail — zero halo recompute without the head conv1's VMEM
# spike). Starts after queue 12 (integration) finishes. Results are
# integrated manually (r3_integrate parses queues 7/9/10/11 only).
set -u
LOG=${1:-/tmp/r3_queue13.log}
Q12LOG=${2:-/tmp/r3_queue12.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue12..." | tee -a "$LOG"
until grep -q "QUEUE12 DONE" "$Q12LOG" 2>/dev/null; do sleep 120; done
echo "queue12 done; starting $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. L2 splitband: head block + one-band 3-block tail (the lever the
#    whole-stage one-band plans can't reach under VMEM)
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=banded28,splitband28,split,full python -u bench.py
# 2. L1 splitband too (2-block one-band tail at 56x56 — may VMEM-OOM,
#    fails fast, cheap information)
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=splitband56,splitband28,split,full python -u bench.py
# 3. the L2 winner + batch amortization
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=banded28,splitband28,split,full MMB_BENCH_BATCH=1536 python -u bench.py
# 4. ViT: layout-native pair-packed attention (ops/attention.py,
#    MMB_FUSED_ATTN=pairs) — no transposes, scores in VMEM
run MMB_FUSED_ATTN=pairs python -u scripts/perf_vit_flagship.py
# 5. pairs + int8 Denses (the one prior ViT win)
run MMB_FUSED_ATTN=pairs MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
# 6. ViT trace at small B (fits the tunnel's HTTP 413 payload limit):
#    ground truth on where the remaining step time lives
run MMB_VIT_BENCH_BATCH=32 python -u scripts/profile_vit.py /tmp/trace_vit_b32
echo "QUEUE13 DONE" | tee -a "$LOG"
