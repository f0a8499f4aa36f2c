#!/bin/bash
# Round-3 TPU queue 8: lever-numbering probes.
#  - grouped-conv formulations A/B (VERDICT lever c)
#  - front-end stem-chain decomposition E-H (lever a grounding)
#  - ViT-flagship device trace (post-f32-fix ground truth)
# Starts after queue 7 finishes (QUEUE7 DONE in its log).
set -u
LOG=${1:-/tmp/r3_queue8.log}
Q7LOG=${2:-/tmp/r3_queue7.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue7..." | tee -a "$LOG"
until grep -q "QUEUE7 DONE" "$Q7LOG" 2>/dev/null; do sleep 120; done
echo "queue7 done; starting $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

run python -u scripts/perf_grouped_dg.py
run python -u scripts/perf_frontend.py
run python -u scripts/profile_vit.py /tmp/trace_vit_r3
run MMB_VIT_LNFOLD=1 python -u scripts/perf_vit_flagship.py
run MMB_VIT_LNFOLD=1 MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE8 DONE" | tee -a "$LOG"
