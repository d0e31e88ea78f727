#!/usr/bin/env bash
# Round-4 chip queue B (detached, ONE TPU job at a time):
#   1. dense-resident vs paired_streamed step A/B at 102K faces (rerun
#      of queue A's arm-1 failure: PYTHONPATH)
#   2. bench.py with the canonical bench_scan timer (production
#      chunk-dispatch semantics)
#   3. 4L x 16F equal-capacity row-grid step probe (next wider-row dial)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p records outputs
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== chipqueue B start $(date +%H:%M:%S) ==="
python probes/dense102k_ab.py > records/dense102k_ab_r4.log 2>&1
echo "=== dense102k_ab done $(date +%H:%M:%S) ==="
sleep 120
python bench.py > records/bench_r4b.log 2>&1
echo "=== bench done $(date +%H:%M:%S) ==="
sleep 120
ROWMODE_ARMS=8x8,4x16 python probes/rowmode_probe.py \
  > records/rowmode4x16_r4.log 2>&1
echo "=== rowmode 4x16 done $(date +%H:%M:%S) ==="
tail -2 records/dense102k_ab_r4.log
tail -1 records/bench_r4b.log
grep train_step records/rowmode4x16_r4.log
echo "CHIPQUEUE_B_DONE"
