#!/bin/bash
# Round-3 TPU queue 7: banded L2 (packed-halo fix) + current-default trace.
# Waits for the tunnel to come back before starting.
set -u
LOG=${1:-/tmp/r3_queue7.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((128,128)).sum()))" >/dev/null 2>&1
}

echo "waiting for tunnel..." | tee -a "$LOG"
until probe; do
  echo "tunnel down $(date +%H:%M:%S)" | tee -a "$LOG"
  sleep 300
done
echo "tunnel up $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. default with the packed-halo banded28 L1 (regression check vs 10757-61)
run python -u bench.py
# 2. banded L2, the run the HBM OOM blocked
run MMB_TRUNK_PLAN=banded28,banded14,split,full python -u bench.py
# 3. device trace of the current default (per-category ground truth)
run python -u scripts/profile_step.py /tmp/trace_r3c
echo "QUEUE7 DONE" | tee -a "$LOG"
