#!/usr/bin/env bash
# Round-4 chip queue C: waits for scale record A (records/scale_r4a.log)
# to finish, then runs
#   1. the 4Lx16F vs 8Lx8F step probe (queue B's crashed arm, retried)
#   2. scale record B: 32 frames x GEN_SPP 128 (verdict item 7 — the
#      identifiability record; grid fixed at the 8Lx8F default so B vs A
#      isolates the frame/SPP axis, A vs r3d isolates the grid axis)
# Record B trims the eval render to 8 frames to fit the round window.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p records outputs
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== queue C waiting for record A $(date +%H:%M:%S) ==="
# gate on the record-A process tree exiting (covers failure exits too;
# pgrep is only used to WAIT, never to kill)
while pgrep -f "run_scale_demo.sh" > /dev/null 2>&1; do
  sleep 120
done
echo "=== record A finished $(date +%H:%M:%S) ==="
tail -3 records/scale_r4a.log
sleep 300   # generous gap between TPU client exits (round-4 hangs came
            # from launching too soon after a client exit)

echo "=== record B start $(date +%H:%M:%S) ==="
# 24 frames x GEN_SPP 128 = 3x the r4a/r3d effective sample budget —
# sized to finish inside the round window (the correlation receipts come
# from checkpoints via probes/scale_shuffle_check.py, so a late kill
# after brdf1 still yields the identifiability result)
ROOT=workdir_scene_xl EXP=tpu_r4b N_TRAIN=24 N_CLUTTER=2000 GEN_SPP=128 \
  RENDER_FRAMES=8 bash scripts/run_scale_demo.sh > records/scale_r4b.log 2>&1
echo "=== record B done $(date +%H:%M:%S) ==="
tail -5 records/scale_r4b.log
echo "CHIPQUEUE_C_DONE"
