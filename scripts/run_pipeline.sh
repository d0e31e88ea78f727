#!/usr/bin/env bash
# Full 9-stage IRIS pipeline (TPU-native), parameterized per scene.
# Mirrors the reference's per-scene train.sh stage chain
# (scripts/scannetpp/bathroom2/train.sh) with our module CLIs and pkl/npz
# artifacts instead of Lightning ckpt renames.
#
# Usage: DATASET=synthetic DATASET_PATH=/data/kitchen EXP=kitchen \
#        scripts/run_pipeline.sh
set -euo pipefail

DATASET=${DATASET:-synthetic}            # synthetic | real | scannetpp
DATASET_PATH=${DATASET_PATH:?set DATASET_PATH}
DATASET_ROOT=${DATASET_ROOT:-$DATASET_PATH}
SCENE=${SCENE:-$DATASET_PATH}            # scene id for scannetpp
EXP=${EXP:?set EXP}
LDR_IMG_DIR=${LDR_IMG_DIR:-}
HAS_PART=${HAS_PART:-1}
CRF_BASIS=${CRF_BASIS:-3}
RES_SCALE=${RES_SCALE:-1.0}
SPP=${SPP:-128}
spp=${spp:-32}
STEPS_INIT=${STEPS_INIT:-2000}
STEPS_BRDF=${STEPS_BRDF:-4000}
STEPS_EMITTER=${STEPS_EMITTER:-1000}
SPP_BAKE_DIFFUSE=${SPP_BAKE_DIFFUSE:-256}
SPP_REFINE_DIFFUSE=${SPP_REFINE_DIFFUSE:-128}
SPP_REFINE_SPECULAR=${SPP_REFINE_SPECULAR:-64}
INDIR_DEPTH=${INDIR_DEPTH:-5}

CKPT=checkpoints/$EXP
BAKE=$CKPT/bake
OUT=outputs/$EXP
LDR_ARG=${LDR_IMG_DIR:+--ldr_img_dir $LDR_IMG_DIR}

COMMON_DS="--dataset_root $DATASET_ROOT --scene $SCENE --dataset $DATASET --res_scale $RES_SCALE $LDR_ARG"
TRAIN_DS="--dataset $DATASET $DATASET_PATH --scene $SCENE --res_scale $RES_SCALE $LDR_ARG"

# 1. bake surface light field
python -m iris_tpu.pipeline.slf_bake $COMMON_DS --output $BAKE

# 2. extract emitter mask
python -m iris_tpu.pipeline.extract_emitter $COMMON_DS --output $BAKE \
    --threshold 0.99

# 3. joint BRDF + emitter initialization
python -m iris_tpu.pipeline.initialize --experiment_name $EXP/init \
    $TRAIN_DS --voxel_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
    --has_part $HAS_PART --SPP $SPP --spp $spp --crf_basis $CRF_BASIS \
    --max_steps $STEPS_INIT

# 4. write learned emitter radiance into emitter.npz
python -m iris_tpu.pipeline.extract_emitter $COMMON_DS --output $BAKE \
    --mode update --ckpt checkpoints/$EXP/init/last.pkl

# 5. bake shading caches
python -m iris_tpu.pipeline.bake_shading $COMMON_DS \
    --slf_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
    --output $OUT/shading --spp_diffuse $SPP_BAKE_DIFFUSE

# 6. optimize BRDF + CRF against the caches
python -m iris_tpu.pipeline.train_brdf_crf --experiment_name $EXP/brdf0 \
    $TRAIN_DS --has_part $HAS_PART --crf_basis $CRF_BASIS \
    --ckpt_path checkpoints/$EXP/init/last.pkl \
    --voxel_path $BAKE/vslf.npz --emitter_path $BAKE/emitter.npz \
    --cache_dir $OUT/shading --lp 0.005 --la 0.01 --l_crf_weight 0.001 \
    --max_steps $STEPS_BRDF

# 7. re-bake the SLF with the learned CRF
python -m iris_tpu.pipeline.slf_refine $COMMON_DS --output $BAKE \
    --load vslf.npz --save vslf_0.npz \
    --ckpt checkpoints/$EXP/brdf0/last.pkl --crf_basis $CRF_BASIS

# 8. refine emitter radiance
python -m iris_tpu.pipeline.train_emitter --experiment_name $EXP/emitter \
    $TRAIN_DS --crf_basis $CRF_BASIS --SPP $SPP --spp $spp \
    --ckpt_path checkpoints/$EXP/brdf0/last.pkl \
    --voxel_path $BAKE/vslf_0.npz --emitter_path $BAKE/emitter.npz \
    --max_steps $STEPS_EMITTER
python -m iris_tpu.pipeline.extract_emitter $COMMON_DS --output $BAKE \
    --mode update --ckpt checkpoints/$EXP/emitter/emitter_last.pkl

# 9. refine shadings with the learned BRDF + final BRDF/CRF pass
python -m iris_tpu.pipeline.refine_shading $COMMON_DS \
    --slf_path $BAKE/vslf_0.npz --emitter_path $BAKE/emitter.npz \
    --ckpt checkpoints/$EXP/brdf0/last.pkl --output $OUT/shading_1 \
    --spp_diffuse $SPP_REFINE_DIFFUSE --spp_specular $SPP_REFINE_SPECULAR \
    --indir_depth $INDIR_DEPTH

python -m iris_tpu.pipeline.train_brdf_crf --experiment_name $EXP/brdf1 \
    $TRAIN_DS --has_part $HAS_PART --crf_basis $CRF_BASIS \
    --ckpt_path checkpoints/$EXP/init/last.pkl \
    --voxel_path $BAKE/vslf_0.npz --emitter_path $BAKE/emitter.npz \
    --cache_dir $OUT/shading_1 --lp 0.005 --la 0.01 --l_crf_weight 0.001 \
    --max_steps $STEPS_BRDF

echo "pipeline complete: checkpoints/$EXP/brdf1/last.pkl"
