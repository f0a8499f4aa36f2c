#!/bin/bash
# Parameterized TPU measurement-queue runner (replaces the round-3
# r3_tpu_queue{1..15}.sh one-shots).
#
#   bash scripts/tpu_queue.sh <queuefile> [logfile]
#
# The queue file lists one measurement per line:
#   [ENV=VAL ...] <command ...>
# Blank lines and #-comments are skipped. Each entry is:
#   - probe-gated: a short timed TPU compute must pass before the entry
#     runs (the axon tunnel dies for 1-2h stretches; a raw run burns its
#     whole timeout while down). While the tunnel is down we sleep and
#     retry rather than skipping the entry.
#   - bounded by `timeout $MMB_QUEUE_TIMEOUT` (default 2400 s), and its
#     exit status is logged (`exit=N`, 124 = timeout) so a killed or
#     crashed run is distinguishable from an empty result in the log.
set -u -o pipefail
QUEUE=${1:?usage: tpu_queue.sh <queuefile> [logfile]}
LOG=${2:-/tmp/$(basename "${QUEUE%.*}").log}
TIMEOUT=${MMB_QUEUE_TIMEOUT:-2400}
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"   # a /tmp wipe must not silently
                                        # disable the persistent cache
: > "$LOG"

probe() {
  # MMB_PROBE_TIMEOUT: on a loaded 1-core box the jax import alone can
  # exceed 90 s (measured 172 s with pytest running) — a false "tunnel
  # down". 240 s default keeps the gate useful without starving the queue.
  timeout "${MMB_PROBE_TIMEOUT:-240}" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))" >/dev/null 2>&1
}

wait_for_tunnel() {
  until probe; do
    echo "$(date +%H:%M:%S) tunnel down" | tee -a "$LOG"
    sleep 180
  done
}

run() {
  echo "=== $* ===" | tee -a "$LOG"
  local t0=$SECONDS status
  timeout "$TIMEOUT" env "$@" 2>&1 \
    | grep -v -E "WARNING|^I0000" | tee -a "$LOG"
  status=${PIPESTATUS[0]}
  echo "exit=$status wall=$((SECONDS - t0))s" | tee -a "$LOG"
  echo "---" | tee -a "$LOG"
}

while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue ;; esac
  wait_for_tunnel
  # shellcheck disable=SC2086
  run $line
done < "$QUEUE"
echo "QUEUE DONE: $QUEUE" | tee -a "$LOG"
