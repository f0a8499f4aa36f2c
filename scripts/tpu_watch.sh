#!/bin/bash
# Tunnel watcher: run a measurement queue as soon as the axon TPU
# tunnel is reachable, then integrate the winner into source defaults.
#
#   bash scripts/tpu_watch.sh [queuefile] [logfile]
#
# tpu_queue.sh already probe-gates every entry, so this wrapper only
# adds the final integration step and a DONE marker.
set -u
QUEUE=${1:-scripts/queues/r4_levers.txt}
LOG=${2:-/tmp/$(basename "${QUEUE%.*}").log}
cd /root/repo
bash scripts/tpu_queue.sh "$QUEUE" "$LOG"
echo "$(date +%H:%M:%S) queue finished - integrating" | tee -a "$LOG"
PYTHONPATH=/root/repo:${PYTHONPATH:-} python scripts/integrate_bench.py \
  "$LOG" 2>&1 | tee -a "$LOG"
echo "$(date +%H:%M:%S) WATCH DONE" | tee -a "$LOG"
