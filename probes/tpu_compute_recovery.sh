#!/bin/bash
# Compute-level TPU recovery probe (round-4): the round-3b failure mode
# passes client creation but hangs before the first dispatch, so probe
# with an actual tiny jit + fetch. Each attempt is its own process (fresh
# TCP connection -> orchestrator redial); attempts that hang are killed
# by timeout (the program is trivial; nothing mid-large-compile to wedge)
# and retried after a gap. Writes probes/TPU_COMPUTE_OK on success.
LOG=/root/repo/probes/tpu_compute_recovery.log
MARKER=/root/repo/probes/TPU_COMPUTE_OK
rm -f "$MARKER"
while true; do
  echo "=== compute probe $(date -u +%H:%M:%S) ===" >> "$LOG"
  ATTEMPT=$(timeout 600 python3 -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
print('COMPUTE_OK', float(x), flush=True)
import os; os._exit(0)
" 2>&1)
  printf '%s\n' "$ATTEMPT" >> "$LOG"
  if printf '%s' "$ATTEMPT" | grep -q COMPUTE_OK; then
    date -u > "$MARKER"
    echo "RECOVERED $(date -u)" >> "$LOG"
    exit 0
  fi
  sleep 120
done
