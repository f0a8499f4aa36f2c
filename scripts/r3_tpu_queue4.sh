#!/bin/bash
# Round-3 TPU queue 4: trunk-plan sweep under the mixed-precision default
# (bf16 L1/L2 + int8 L3/L4), hunting the L1/L2 intermediate-traffic cut.
set -u
LOG=${1:-/tmp/r3_queue4.log}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1500 env "$@" 2>&1 | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

# control: new default (mixed plan, bf16 augment matrices, no s2d)
run python -u bench.py
# banded L1 variants (bf16 stages only; taller bands amortize recompute)
run MMB_TRUNK_PLAN=banded28,blocks,split,full python -u bench.py
run MMB_TRUNK_PLAN=banded14,blocks,split,full python -u bench.py
# banded L2 too
run MMB_TRUNK_PLAN=banded28,banded14,split,full python -u bench.py
# L2 split under mixed
run MMB_TRUNK_PLAN=blocks,split,split,full python -u bench.py
# stem/augment decomposition with the new augment
run python -u scripts/perf_stem_s2d.py
echo "QUEUE4 DONE" | tee -a "$LOG"
