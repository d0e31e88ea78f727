#!/bin/bash
# Round-5 leaf_size A/B queue: one process per arm, 150 s settle gap
# between TPU client exits (CLAUDE.md operational lesson). Arm 4 is the
# control re-measured under the identical harness.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=records/leafsize_ab_r5.log
: > "$LOG"
for ls in 4 8 10; do
  python probes/leafsize_ab.py "$ls" >> "$LOG" 2>&1
  sleep 150
done
echo "LEAFSIZE_AB_DONE" >> "$LOG"
