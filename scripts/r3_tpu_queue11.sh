#!/bin/bash
# Round-3 TPU queue 11 (REWRITTEN after queue-9 OOM data): the original
# 126 MB-cap retries are pointless — the one-band whole-stage plans
# need 158-165 MB of the 128 MB physical VMEM (queue-9 compiler OOM
# reports), so no vmem_limit_bytes value can admit them. Kept: combos
# of the queue-10 winners, measured only if queue 10 shows a win.
set -u
LOG=${1:-/tmp/r3_queue11.log}
Q10LOG=${2:-/tmp/r3_queue10.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue10..." | tee -a "$LOG"
until grep -q "QUEUE10 DONE" "$Q10LOG" 2>/dev/null; do sleep 120; done
echo "queue10 done; starting $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# L1 splitband on top of the best queue-10 trunk plan candidates
# (L1 tail = 2-block one-band at 56x56; may VMEM-OOM -> fails fast)
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=splitband56,splitband28,split,full python -u bench.py
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=splitband56,splitband28,full,full python -u bench.py
echo "QUEUE11 DONE" | tee -a "$LOG"
