#!/bin/bash
# Round-5 FINAL chip sequence (round-end checklist, CLAUDE.md):
# wait for the denoiser A/B -> all-arms step receipts with the round-5d
# forward-gather levers -> clean uncontended bench.py (warms the compile
# cache for the driver's end-of-round run) -> graft entry warm.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q DENOISE_PROD_DONE records/denoise_prod_r5.log 2>/dev/null; do
  sleep 120
done
sleep 150
ROWMODE_ARMS=32x2,8x8,4x16 python probes/rowmode_probe.py \
  > records/fwd_lever_arms_r5.log 2>&1
sleep 150
python bench.py > records/bench_final_r5.log 2>&1
sleep 150
python __graft_entry__.py > records/graft_entry_final_r5.log 2>&1
echo "R5_FINAL_DONE" >> records/bench_final_r5.log
