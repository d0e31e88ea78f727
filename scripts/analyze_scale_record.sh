#!/usr/bin/env bash
# Post-record analysis (round 4): stage wall-clocks + decomposition
# metrics from a scale-record log, plus the checkpoint-based correlation
# receipts (CPU; axon stripped so the probe cannot disturb a TPU job).
#   usage: scripts/analyze_scale_record.sh records/scale_r4a.log \
#            workdir_scene_l tpu_r4a records/scale_shuffle_r4a.json
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${1:?log}; ROOT=${2:?scene root}; EXP=${3:?exp}; OUT=${4:?out json}

echo "== stage timeline =="
grep -a "SCALE \|time (s)" "$LOG" | grep -a -v WARNING
echo "== render / decomposition metrics =="
grep -a -E "PSNR|SSIM|IoU|logMSE|log_mse|crf|L2|metric" "$LOG" | tail -25
echo "== checkpoint correlation receipts -> $OUT =="
env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu METALLIC_AMP=0.8 \
  python probes/scale_shuffle_check.py "$ROOT" "$EXP" | tee "$OUT"
# preserve the training scalar logs (outputs/ is gitignored+ephemeral;
# round-2's logs were lost this way — PERF.md receipts policy)
mkdir -p "records/${EXP}_logs"
for d in outputs/$EXP/*/train_log.jsonl; do
  [ -f "$d" ] && cp "$d" "records/${EXP}_logs/$(basename "$(dirname "$d")")_train_log.jsonl"
done
echo "saved logs: $(ls records/${EXP}_logs 2>/dev/null | wc -l)"
