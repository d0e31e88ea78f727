#!/usr/bin/env bash
# Round-5 chip queue 2: after the window-policy A/B, the gather-size probe.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
while ! grep -aq "WINDOW_POLICY_DONE" records/window_policy_r5.log 2>/dev/null; do
  sleep 30
done
sleep 180
python probes/gather_size_probe.py > records/gather_size_r5.log 2>&1
echo "R5_QUEUE2_DONE $(date +%H:%M:%S)"
