#!/bin/bash
# Post-scale-record chip queue (round 3f): waits for the detached
# run_scale_demo.sh to print SCALE_DONE (or exit), leaves the 2-min
# client-spacing gap (TODO.md round-3b incident), then runs the two
# queued device probes one at a time:
#   1. dense_streamed traversal A/B (records/dense_streamed_ab_r3f.log)
#   2. row-gather wider arms 4x16 / 2x32 (records/rowmode_wide_r3f.log)
# Launch detached: setsid nohup bash probes/run_r3f_chipqueue.sh \
#   > records/chipqueue_r3f.log 2>&1 &
set -u
cd /root/repo
SCALE_LOG=records/scale32_r3b.log
# epoch after which NO new probe may start (protects the driver's
# round-end bench.py from chip contention); default = +20 min from launch
PROBE_CUTOFF=${PROBE_CUTOFF:-$(( $(date +%s) + 1200 ))}

past_cutoff() {
  if [ "$(date +%s)" -ge "$PROBE_CUTOFF" ]; then
    echo "[queue] past probe cutoff ($(date -u +%H:%M:%S)) — $1 skipped"
    return 0
  fi
  return 1
}

echo "[queue] waiting for SCALE_DONE in $SCALE_LOG ($(date -u +%H:%M:%S))"
while true; do
  if grep -q "SCALE_DONE" "$SCALE_LOG"; then
    echo "[queue] scale record complete $(date -u +%H:%M:%S)"; break
  fi
  # pipeline crashed/was killed: no python stage process left alive
  if ! pgrep -f run_scale_demo.sh > /dev/null \
      && ! pgrep -f iris_tpu.pipeline > /dev/null \
      && ! pgrep -f iris_tpu.data.make_demo_dataset > /dev/null \
      && ! pgrep -f iris_tpu.utils.metric > /dev/null; then
    echo "[queue] scale run no longer alive without SCALE_DONE ($(date -u +%H:%M:%S)) — proceeding anyway"
    break
  fi
  sleep 60
done

echo "[queue] 2-min client-spacing gap"
sleep 120

if past_cutoff "probe 1"; then exit 0; fi
echo "[queue] probe 1: dense_streamed A/B start $(date -u +%H:%M:%S)"
AB_ARMS=dense_streamed python probes/paired_streamed_ab.py \
  > records/dense_streamed_ab_r3f.log 2>&1
rc=$?   # capture BEFORE the echo's $(date) resets $?
echo "[queue] probe 1 done $(date -u +%H:%M:%S) (exit $rc)"

sleep 120

if past_cutoff "probe 2"; then exit 0; fi
echo "[queue] probe 2: rowmode 4x16/2x32 start $(date -u +%H:%M:%S)"
ROWMODE_ARMS=4x16,2x32 python probes/rowmode_probe.py \
  > records/rowmode_wide_r3f.log 2>&1
rc=$?
echo "[queue] probe 2 done $(date -u +%H:%M:%S) (exit $rc)"
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
