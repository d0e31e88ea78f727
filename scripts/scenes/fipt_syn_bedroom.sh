#!/usr/bin/env bash
# fipt_syn_bedroom: reference scripts/fipt/bedroom/train.sh budgets, mapped onto our stage CLIs.
# Usage: DATASET_ROOT=/data/... scripts/scenes/fipt_syn_bedroom.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export DATASET=synthetic SCENE=bedroom EXP=fipt_syn_bedroom LDR_IMG_DIR=Image
export DATASET_PATH=${DATASET_ROOT:?set DATASET_ROOT}
export HAS_PART=1 CRF_BASIS=3 RES_SCALE=1.0 VAL_FRAME=10
export SPP=128 spp=32 L_CRF_WEIGHT=0.001
export EPOCHS_INIT=3 EPOCHS_BRDF=2 EPOCHS_EMITTER=1
exec scripts/run_pipeline.sh
