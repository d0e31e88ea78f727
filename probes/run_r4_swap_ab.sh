#!/usr/bin/env bash
# Round-4 recovery sequencing after record A's transient backend crash:
#   1. wait for record B's GEN to finish (its dataset is then reusable)
#   2. stop record B cleanly (exact PIDs: queue-C shell 16429, record-B
#      shell 21745, and whatever python child 21745 currently has — the
#      gen python exits on its own at the gate, so the child at kill time
#      is nothing or the first slf_bake, killed between dispatches)
#   3. resume record A from stage 2 (gen + slf_bake artifacts on disk)
#   4. resume record B from stage 1 with SKIP_GEN (trimmed render)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

echo "=== swap: waiting for record B gen $(date +%H:%M:%S) ==="
while ! grep -aq "SCALE gen done" records/scale_r4b.log 2>/dev/null; do
  # if B somehow died already, stop waiting
  kill -0 21745 2>/dev/null || break
  sleep 60
done
echo "=== B gen finished/exited $(date +%H:%M:%S); stopping B ==="
# stop the shells first so no new stage launches, then any python child
kill 16429 2>/dev/null
CHILD=$(ps -o pid= --ppid 21745 2>/dev/null | tr -d ' ')
kill 21745 2>/dev/null
[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null
sleep 10
echo "--- survivors (manual review; never pattern-killed) ---"
ps aux | grep "iris_tpu.pipeline" | grep -v grep || true
sleep 290   # generous client-exit gap

echo "=== record A resume (stage 2) $(date +%H:%M:%S) ==="
SKIP_GEN=1 START_STAGE=2 ROOT=workdir_scene_l EXP=tpu_r4a \
  N_CLUTTER=2000 bash scripts/run_scale_demo.sh \
  >> records/scale_r4a.log 2>&1
echo "=== record A done $(date +%H:%M:%S) ==="
tail -3 records/scale_r4a.log
sleep 300

echo "=== record B resume (stage 1, gen kept) $(date +%H:%M:%S) ==="
SKIP_GEN=1 ROOT=workdir_scene_xl EXP=tpu_r4b N_TRAIN=24 N_CLUTTER=2000 \
  GEN_SPP=128 RENDER_FRAMES=4 bash scripts/run_scale_demo.sh \
  >> records/scale_r4b.log 2>&1
echo "=== record B done $(date +%H:%M:%S) ==="
tail -3 records/scale_r4b.log
echo "SWAP_AB_DONE"
