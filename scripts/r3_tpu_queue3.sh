#!/bin/bash
# Round-3 TPU queue 3: mixed-precision trunk plan + s2d stem A/B.
set -u
LOG=${1:-/tmp/r3_queue3.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1500 env "$@" 2>&1 | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# A: mixed plan alone (no s2d)
run MMB_S2D_STEM=0 MMB_TRUNK_INT8=0,0,1,1 python -u bench.py
# B: s2d stem alone (bf16 trunk)
run MMB_TRUNK_INT8=0 python -u bench.py
# C: s2d + mixed plan
run MMB_TRUNK_INT8=0,0,1,1 python -u bench.py
# D: s2d + full int8 (control)
run MMB_TRUNK_INT8=1 python -u bench.py
echo "QUEUE3 DONE" | tee -a "$LOG"
