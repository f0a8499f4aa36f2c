#!/bin/bash
# A/B the fused-trunk per-stage kernel strategies via the real bench.
# Usage: bash scripts/bench_plans.sh "plan1" "plan2" ...
cd /root/repo
for plan in "$@"; do
  echo "=== MMB_TRUNK_PLAN=$plan ==="
  MMB_TRUNK_PLAN="$plan" timeout 1500 python bench.py 2>&1 | tail -1
done
