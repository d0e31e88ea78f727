#!/usr/bin/env bash
# Waits for the swap sequencer to finish (its B leg fails fast: record
# B's gen never completed before the backend hang, so SKIP_GEN=1 finds
# no dataset), then relaunches record B properly WITH gen and a trimmed
# eval render. One TPU job at a time throughout.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

while ! grep -q "SWAP_AB_DONE" outputs/swap_ab_r4.log 2>/dev/null; do
  sleep 120
done
if [ -d workdir_scene_xl/train ]; then
  echo "B dataset exists; nothing to fix"; exit 0
fi
sleep 300
echo "=== record B relaunch (with gen) $(date +%H:%M:%S) ==="
rm -rf workdir_scene_xl
ROOT=workdir_scene_xl EXP=tpu_r4b N_TRAIN=24 N_CLUTTER=2000 GEN_SPP=128 \
  RENDER_FRAMES=4 bash scripts/run_scale_demo.sh >> records/scale_r4b.log 2>&1
echo "=== record B done $(date +%H:%M:%S) ==="
tail -3 records/scale_r4b.log
echo "B_FIX_DONE"
