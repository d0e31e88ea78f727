#!/usr/bin/env bash
# Waits for the policy probe, then runs the scatter-layout microbench.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
while ! grep -q "POLICY_FIX_DONE" outputs/policy_fix_r4.log 2>/dev/null; do
  sleep 60
done
sleep 240
python probes/scatter_layout_probe.py > records/scatter_layout_r4.log 2>&1
echo "=== scatter layout done $(date +%H:%M:%S) ==="
grep -a '"probe"' records/scatter_layout_r4.log
echo "SCATTER_PROBE_DONE"
