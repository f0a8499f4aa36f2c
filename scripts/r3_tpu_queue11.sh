#!/bin/bash
# Round-3 TPU queue 11: VMEM-OOM insurance for the one-band banded plans.
# Queue 9/10 try them at caps 116/120; the L2 one-band working set is
# estimated ~121 MB with double-buffering, so an OOM there is expected —
# these retries run at 126 MB (hardware VMEM is 128). Compile OOMs fail
# fast, successful compiles give the decisive number either way.
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

run MMB_HWBC_VMEM=126 MMB_TRUNK_PLAN=banded56,blocks,split,full python -u bench.py
run MMB_HWBC_VMEM=126 MMB_TRUNK_PLAN=banded28,banded28,split,full python -u bench.py
run MMB_HWBC_VMEM=126 MMB_TRUNK_PLAN=banded56,banded28,split,full python -u bench.py
echo "QUEUE11 DONE" | tee -a "$LOG"
