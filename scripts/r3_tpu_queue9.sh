#!/bin/bash
# Round-3 TPU queue 9: banded-blur bench A/B + ViT padseq A/B + stem
# C_in-padding probe/A-B + B=1536 amortization check. Starts after queue 8.
set -u
LOG=${1:-/tmp/r3_queue9.log}
Q8LOG=${2:-/tmp/r3_queue8.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
: > "$LOG"

echo "waiting for queue8..." | tee -a "$LOG"
until grep -q "QUEUE8 DONE" "$Q8LOG" 2>/dev/null; do sleep 120; done
echo "queue8 done; starting $(date +%H:%M:%S)" | tee -a "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  { time timeout 2400 env "$@" 2>&1; } 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# 1. bench with the banded Toeplitz blur construction (control: 10757-61)
run python -u bench.py
# 2. stem conv C_in-padding formulation probe (cheap; informs 3)
run python -u scripts/perf_stem_cpad.py
# 3. end-to-end: C_in-padded 7x7 stem
run MMB_STEM_CPAD=1 python -u bench.py
# 4. fixed-cost amortization past 1024 (2048 hits the tunnel's HTTP 413)
run MMB_BENCH_BATCH=1536 python -u bench.py
# 4b/4c. one-band whole-stage variants: zero halo recompute (compile may
# VMEM-OOM -> fails fast, cheap information either way)
run MMB_HWBC_VMEM=116 MMB_TRUNK_PLAN=banded56,blocks,split,full python -u bench.py
run MMB_HWBC_VMEM=120 MMB_TRUNK_PLAN=banded28,banded28,split,full python -u bench.py
# 5-7. ViT flagship: padseq alone, padseq+lnfold, padseq+lnfold+int8
run MMB_VIT_PADSEQ=auto python -u scripts/perf_vit_flagship.py
run MMB_VIT_PADSEQ=auto MMB_VIT_LNFOLD=1 python -u scripts/perf_vit_flagship.py
run MMB_VIT_PADSEQ=auto MMB_VIT_LNFOLD=1 MMB_VIT_INT8=1 python -u scripts/perf_vit_flagship.py
echo "QUEUE9 DONE" | tee -a "$LOG"
