#!/bin/bash
# Round-3 TPU queue 12: auto-integration. After queue 11 finishes, parse
# every bench result from queues 7/9/10/11, flip the source defaults to
# the winning configuration, and confirm with a plain `python bench.py`
# (scripts/r3_integrate.py — rolls back on failure, leaves winning edits
# uncommitted for the session to test+commit).
set -u
LOG=${1:-/tmp/r3_queue12.log}
Q11LOG=${2:-/tmp/r3_queue11.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue11..." | tee -a "$LOG"
until grep -q "QUEUE11 DONE" "$Q11LOG" 2>/dev/null; do sleep 120; done
echo "queue11 done; integrating $(date +%H:%M:%S)" | tee -a "$LOG"

{ time timeout 3600 python -u scripts/r3_integrate.py 2>&1; } 2>&1 \
  | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
echo "QUEUE12 DONE" | tee -a "$LOG"
