#!/bin/bash
# Round-3 TPU queue 2: localize the int8 shortfall + front-end split.
set -u
LOG=${1:-/tmp/r3_queue2.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

run python -u scripts/perf_hwbc_int8.py
run python -u scripts/perf_frontend.py
# bf16 control at B=1024 with the refactored (unit-scale) kernels
run python -u bench.py
echo "QUEUE2 DONE" | tee -a "$LOG"
