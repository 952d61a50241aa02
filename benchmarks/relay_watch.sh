#!/bin/bash
# Probe the axon relay every 10 min; when a tiny matmul completes, run the
# round-4 hardware runbook once and exit. Log everything to the given file.
LOG=${1:-/tmp/relay_watch.log}
cd /root/repo
echo "watch start $(date)" >> "$LOG"
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('probe ok', float((x@x).sum()))
" >> "$LOG" 2>&1; then
    echo "RELAY UP $(date) — running runbook" >> "$LOG"
    timeout 36000 python benchmarks/round4_hw.py >> "$LOG" 2>&1
    echo "RUNBOOK DONE rc=$? $(date)" >> "$LOG"
    exit 0
  fi
  echo "probe failed $(date)" >> "$LOG"
  sleep 600
done
