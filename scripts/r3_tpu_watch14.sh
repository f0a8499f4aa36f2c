#!/bin/bash
# Tunnel watcher: probe the axon TPU with a short timed compute every
# 3 minutes; when a probe passes, run queue 14 (the queue-13 re-run:
# splitband trunk A/Bs + ViT pair-packed attention). The tunnel is
# known to die for ~1-2h stretches (verify SKILL.md) — a raw queue run
# burns its 2400s timeout per entry while down, so gate on the probe.
set -u
LOG=${1:-/tmp/r3_watch14.log}
cd /root/repo
: > "$LOG"
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) tunnel UP - starting queue 14" | tee -a "$LOG"
    bash scripts/r3_tpu_queue14.sh /tmp/r3_queue14.log
    echo "$(date +%H:%M:%S) queue 14 finished - integrating" | tee -a "$LOG"
    PYTHONPATH=/root/repo:${PYTHONPATH:-} python scripts/r3_integrate.py \
      2>&1 | tee -a "$LOG"
    echo "$(date +%H:%M:%S) WATCH14 DONE" | tee -a "$LOG"
    break
  fi
  echo "$(date +%H:%M:%S) tunnel down" >> "$LOG"
  sleep 180
done
