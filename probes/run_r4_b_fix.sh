#!/usr/bin/env bash
# Post-record-A sequencing v2: rownative layout A/B probe, then record B
# relaunch (with gen; the original B gen died in the backend hang).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

while ! grep -q "SWAP_AB_DONE" outputs/swap_ab_r4.log 2>/dev/null; do
  sleep 120
done
sleep 300

echo "=== rownative probe $(date +%H:%M:%S) ==="
python probes/rownative_probe.py > records/rownative_r4.log 2>&1
echo "=== rownative done $(date +%H:%M:%S) ==="
grep -a '"probe"' records/rownative_r4.log || true
sleep 300

echo "=== record B relaunch (with gen) $(date +%H:%M:%S) ==="
rm -rf workdir_scene_xl
ROOT=workdir_scene_xl EXP=tpu_r4b N_TRAIN=24 N_CLUTTER=2000 GEN_SPP=128 \
  RENDER_FRAMES=4 bash scripts/run_scale_demo.sh >> records/scale_r4b.log 2>&1
echo "=== record B done $(date +%H:%M:%S) ==="
tail -3 records/scale_r4b.log
echo "B_FIX_DONE"
