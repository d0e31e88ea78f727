#!/bin/bash
# Round-5: 4Lx16F scale-quality A/B arm (VERDICT item 5 — the promotion
# bar for the 5.32M rays/s dial). Waits for the gather-block probe, then
# regenerates the SEEDED round-4a dataset (bit-identical by construction;
# workdir_scene_l was ephemeral) and runs the full 9-stage pipeline +
# eval + metrics with the 4x16 grid. Compare against the 8x8 metrics in
# records/scale_r4a.log (same protocol as the round-4d "grid-only A/B
# vs r3d": one arm re-run on bit-identical data, the other arm's record
# reused).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q R5_QUEUE3_DONE records/gather_block_r5.log 2>/dev/null; do
  sleep 60
done
sleep 150
ROOT=workdir_scene_l EXP=tpu_r5_4x16 N_CLUTTER=2000 GEN_SPP=64 \
  HASH_LEVELS=4 HASH_FEATURES=16 \
  bash scripts/run_scale_demo.sh > records/scale_r5_4x16.log 2>&1
echo "SCALE_4X16_DONE" >> records/scale_r5_4x16.log
