#!/usr/bin/env bash
# Round-4 chip queue A (run detached, ONE TPU job at a time):
#   1. dense-resident vs paired_streamed step A/B at 102K faces
#   2. new two-regime bench.py confirm (production-default row grid)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p records outputs
# probes import iris_tpu from the repo root; keep the axon site appended
# or the backend plugin fails to register (CLAUDE.md)
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== chipqueue A start $(date +%H:%M:%S) ==="
python probes/dense102k_ab.py > records/dense102k_ab_r4.log 2>&1
echo "=== dense102k_ab done $(date +%H:%M:%S) ==="
sleep 120   # leave the backend a gap between TPU client exits (TODO.md)
python bench.py > records/bench_r4a.log 2>&1
echo "=== bench done $(date +%H:%M:%S) ==="
tail -2 records/dense102k_ab_r4.log
tail -1 records/bench_r4a.log
echo "CHIPQUEUE_A_DONE"
