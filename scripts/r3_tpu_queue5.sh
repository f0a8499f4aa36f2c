#!/bin/bash
# Round-3 TPU queue 5: front-end split-stem probe, ViT int8 flagship,
# compile-cache trial (second identical bench run should skip compile).
set -u
LOG=${1:-/tmp/r3_queue5.log}
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

# 1. front-end lever probe: split augment -> free s2d -> 4x4 stem
run python -u scripts/perf_split_stem.py
# 2. ViT flagship with int8 block Denses (control: 1559 pairs/s, BENCH_NOTES)
run MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
# 3+4. compile-cache trial: same bench twice; if the cache works the
# second run's wall time collapses to the measurement (~1 min)
run python -u bench.py
run python -u bench.py
echo "QUEUE5 DONE" | tee -a "$LOG"
