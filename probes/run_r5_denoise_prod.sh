#!/bin/bash
# Round-5 denoiser quantification at PRODUCTION budget (VERDICT item 6).
# Waits for the 4x16 scale arm (reuses its dataset + init checkpoint +
# its denoise-ON stage-5 caches), then:
#   1. cache-quality receipt: ON / OFF / high-spp ORACLE bakes on 2
#      frames -> PSNR(ON vs oracle), PSNR(OFF vs oracle) per cache map
#   2. downstream receipt: full 16-frame OFF bake + brdf0 refit on OFF
#      caches (identical budget/seed as the pipeline's ON-cache brdf0)
#      -> loss components + metric_brdf on 4 rendered frames per arm
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q SCALE_4X16_DONE records/scale_r5_4x16.log 2>/dev/null; do
  sleep 120
done
sleep 150

LOG=records/denoise_prod_r5.log
: > "$LOG"
ROOT=workdir_scene_l
EXP=tpu_r5_4x16
BAKE=checkpoints/$EXP/bake
DS="--dataset synthetic --scene $ROOT --ldr_img_dir ldr --dataset_root $ROOT"
COMMON="--dataset synthetic --scene $ROOT --ldr_img_dir ldr"

echo "== cache-quality bakes (2 frames) ==" >> "$LOG"
for arm in "on 1 64 1" "off 0 64 1" "oracle 0 512 4"; do
  set -- $arm
  python -m iris_tpu.pipeline.bake_shading $COMMON \
    --slf_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
    --output outputs/$EXP/dn_$1 --spp_diffuse $3 \
    --spp_specular_scale $4 --denoise $2 --max_frames 2 >> "$LOG" 2>&1
  sleep 60
done

python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np
from iris_tpu.utils.exr import read_exr

def psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    peak = max(b.max(), 1e-6)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(peak ** 2 / max(mse, 1e-12))

import json, os
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
sleep 60

echo "== downstream: 16-frame OFF bake + brdf0 refit ==" >> "$LOG"
python -m iris_tpu.pipeline.bake_shading $COMMON \
  --slf_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
  --output outputs/$EXP/shading_off --spp_diffuse 64 --denoise 0 \
  >> "$LOG" 2>&1
sleep 60

python -m iris_tpu.pipeline.train_brdf_crf --experiment_name $EXP/brdf0_off \
  --dataset synthetic $ROOT --scene $ROOT --ldr_img_dir ldr \
  --has_part 1 --crf_basis 3 \
  --ckpt_path checkpoints/$EXP/init/last.pkl \
  --voxel_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
  --cache_dir outputs/$EXP/shading_off --lp 0.005 --la 0.01 \
  --l_crf_weight 0.001 --val_frame 0 --max_steps 4000 --batch_size 8192 \
  --hash_levels 4 --hash_features 16 --log2_hashmap_size 19 \
  >> "$LOG" 2>&1
sleep 60

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
  sleep 60
done
echo "DENOISE_PROD_DONE" >> "$LOG"
