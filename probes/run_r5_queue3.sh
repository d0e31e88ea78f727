#!/bin/bash
# Round-5 queue 3: waits for the leafsize2 queue to finish, then runs the
# gather-block probe. Serialized — ONE TPU job at a time (CLAUDE.md).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q LEAFSIZE_AB2_DONE records/leafsize_ab2_r5.log 2>/dev/null; do
  sleep 60
done
sleep 150
python probes/gather_block_probe.py > records/gather_block_r5.log 2>&1
echo "R5_QUEUE3_DONE" >> records/gather_block_r5.log
