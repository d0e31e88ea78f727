#!/bin/bash
# Round-5 leaf_size A/B, part 2: the control arms the first queue missed
# (arm 1 of run_r5_leafsize.sh imported the pre-policy-fix intersect.py
# and measured DENSE at ls4, not paired_streamed) + the flagship scene
# at ls4 vs ls8 to decide the global default. One process per arm.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=records/leafsize_ab2_r5.log
: > "$LOG"
python probes/leafsize_ab.py 4 8500 >> "$LOG" 2>&1     # ls4 + ps control
sleep 150
python probes/leafsize_ab.py 4 32 >> "$LOG" 2>&1       # flagship control
sleep 150
python probes/leafsize_ab.py 8 32 >> "$LOG" 2>&1       # flagship ls8
sleep 150
echo "LEAFSIZE_AB2_DONE" >> "$LOG"
