#!/bin/bash
# TPU backend recovery probe (CLAUDE.md "Backend outage mode").
# Loops a fresh client-creation attempt; each new TCP connection makes the
# orchestrator redial the terminal. Appends to probes/tpu_recovery.log and
# writes probes/TPU_OK marker file on success, then exits.
LOG=/root/repo/probes/tpu_recovery.log
MARKER=/root/repo/probes/TPU_OK
rm -f "$MARKER"
while true; do
  echo "=== probe attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  # check ONLY the current attempt's output: the log accumulates across
  # sessions, so grepping the whole file would see a PAST success and
  # report recovery instantly during a real outage
  ATTEMPT=$(timeout 1800 python3 -c "
import jax
print(jax.devices(), flush=True)
print('PROBE_OK', flush=True)
import os; os._exit(0)
" 2>&1)
  printf '%s\n' "$ATTEMPT" >> "$LOG"
  if printf '%s' "$ATTEMPT" | grep -q PROBE_OK; then
    date -u > "$MARKER"
    echo "RECOVERED $(date -u)" >> "$LOG"
    exit 0
  fi
  sleep 60
done
