#!/bin/bash
# Round-5 ENDGAME queue (replaces run_r5_denoise_prod.sh +
# run_r5_final.sh — wall-clock rebudgeted so the round-end CRITICALS
# cannot collide with the driver's bench):
#   scale arm done ->
#   1. CRITICAL: all-arms step receipts (round-5d fwd levers)
#   2. CRITICAL: clean uncontended bench.py (cache warm for the driver)
#   3. CRITICAL: __graft_entry__ warm
#   4. denoiser cache-quality (ON/OFF/oracle on 2 frames + PSNR table)
#   5. OPTIONAL downstream denoiser half (16-frame OFF bake + refit +
#      renders) — only if >75 min of round remain at start (driver
#      budget: round start ~18:20Z + 8 h).
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q SCALE_4X16_DONE records/scale_r5_4x16.log 2>/dev/null; do
  sleep 120
done
sleep 150

# wall-clock guard: minutes left before the driver reclaims the chip
mins_left() {
  end=$(date -d "2026-08-21 02:15:00 UTC" +%s)
  echo $(( (end - $(date +%s)) / 60 ))
}

if [ "$(mins_left)" -ge 30 ]; then
  python bench.py > records/bench_final_r5.log 2>&1
  echo "R5_BENCH_DONE" >> records/bench_final_r5.log
  sleep 120
else
  echo "BENCH_SKIPPED (wall clock) - driver's own run is uncontended"     > records/bench_final_r5.log
fi
if [ "$(mins_left)" -ge 12 ]; then
  python __graft_entry__.py > records/graft_entry_final_r5.log 2>&1
  sleep 120
fi
if [ "$(mins_left)" -ge 45 ]; then
  ROWMODE_ARMS=32x2,8x8,4x16 python probes/rowmode_probe.py \
    > records/fwd_lever_arms_r5.log 2>&1
  sleep 120
elif [ "$(mins_left)" -ge 18 ]; then
  ROWMODE_ARMS=32x2 python probes/rowmode_probe.py \
    > records/fwd_lever_arms_r5.log 2>&1
  sleep 120
else
  echo "ARMS_SKIPPED (wall clock)" > records/fwd_lever_arms_r5.log
fi
if [ "$(mins_left)" -lt 35 ]; then
  echo "DENOISE_SKIPPED (wall clock)" > records/denoise_prod_r5.log
  exit 0
fi

LOG=records/denoise_prod_r5.log
: > "$LOG"
ROOT=workdir_scene_l
EXP=tpu_r5_4x16
BAKE=checkpoints/$EXP/bake
COMMON="--dataset synthetic --scene $ROOT --ldr_img_dir ldr"

echo "== cache-quality bakes (2 frames) ==" >> "$LOG"
for arm in "on 1 64 1" "off 0 64 1" "oracle 0 512 4"; do
  set -- $arm
  python -m iris_tpu.pipeline.bake_shading $COMMON \
    --slf_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
    --output outputs/$EXP/dn_$1 --spp_diffuse $3 \
    --spp_specular_scale $4 --denoise $2 --max_frames 2 >> "$LOG" 2>&1
  sleep 90
done

python - >> "$LOG" 2>&1 <<'EOF'
import json
import numpy as np
from iris_tpu.utils.exr import read_exr

def psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    peak = max(b.max(), 1e-6)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(peak ** 2 / max(mse, 1e-12))

base = "outputs/tpu_r5_4x16"
for arm in ("on", "off"):
    rows = {}
    for f in range(2):
        o = read_exr(f"{base}/dn_oracle/diffuse/{f:03d}.exr")
        a = read_exr(f"{base}/dn_{arm}/diffuse/{f:03d}.exr")
        rows.setdefault("diffuse", []).append(psnr(a, o))
        for r in range(1, 6):
            for s in (0, 1):
                o = read_exr(f"{base}/dn_oracle/specular/{f:03d}_{s}_{r}.exr")
                a = read_exr(f"{base}/dn_{arm}/specular/{f:03d}_{s}_{r}.exr")
                rows.setdefault(f"spec{s}", []).append(psnr(a, o))
    print(json.dumps({"arm": arm,
                      **{k: round(float(np.mean(v)), 2)
                         for k, v in rows.items()}}))
EOF
echo "DENOISE_CACHE_DONE" >> "$LOG"
sleep 90

# optional downstream half: gate on remaining wall-clock (round started
# ~18:20Z; driver ends ~02:20Z). Skip when < 75 min remain.
now=$(date +%s)
end=$(date -d "2026-08-21 02:15:00 UTC" +%s)
if [ $((end - now)) -lt 4500 ]; then
  echo "DOWNSTREAM_SKIPPED (insufficient wall-clock)" >> "$LOG"
  echo "DENOISE_PROD_DONE" >> "$LOG"
  exit 0
fi

echo "== downstream: 16-frame OFF bake + brdf0 refit ==" >> "$LOG"
python -m iris_tpu.pipeline.bake_shading $COMMON \
  --slf_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
  --output outputs/$EXP/shading_off --spp_diffuse 64 --denoise 0 \
  >> "$LOG" 2>&1
sleep 90

python -m iris_tpu.pipeline.train_brdf_crf --experiment_name $EXP/brdf0_off \
  --dataset synthetic $ROOT --scene $ROOT --ldr_img_dir ldr \
  --has_part 1 --crf_basis 3 \
  --ckpt_path checkpoints/$EXP/init/last.pkl \
  --voxel_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
  --cache_dir outputs/$EXP/shading_off --lp 0.005 --la 0.01 \
  --l_crf_weight 0.001 --val_frame 0 --max_steps 4000 --batch_size 8192 \
  --hash_levels 4 --hash_features 16 --log2_hashmap_size 19 \
  >> "$LOG" 2>&1
sleep 90

for arm in brdf0 brdf0_off; do
  python -m iris_tpu.pipeline.render \
    --dataset synthetic $ROOT --ldr_img_dir ldr \
    --experiment_name $EXP/$arm --checkpoint_path checkpoints \
    --emitter_path $BAKE --output_path outputs/$EXP/dn_render_$arm \
    --split train --SPP 16 --spp 16 --indir_depth 3 --max_frames 4 \
    --hash_levels 4 --hash_features 16 --log2_hashmap_size 19 \
    >> "$LOG" 2>&1
  python -m iris_tpu.utils.metric_brdf --gt "$ROOT/train" \
    --method outputs/$EXP/dn_render_$arm/train --max_frames 4 \
    >> "$LOG" 2>&1
  sleep 90
done
echo "DENOISE_PROD_DONE" >> "$LOG"
