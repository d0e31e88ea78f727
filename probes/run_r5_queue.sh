#!/usr/bin/env bash
# Round-5 chip queue: wait for the arms probe, gap, then the window
# policy A/B (dense vs paired_streamed at 42K / 72K faces).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
while ! grep -aq "ROWMODE_PROBE_DONE" records/compact_scatter_arms_r5.log 2>/dev/null; do
  sleep 30
done
sleep 180
python probes/window_policy_probe.py > records/window_policy_r5.log 2>&1
echo "R5_QUEUE_DONE $(date +%H:%M:%S)"
