#!/usr/bin/env bash
# fipt_syn_bathroom: reference scripts/fipt/bathroom/train.sh budgets, mapped onto our stage CLIs.
# Usage: DATASET_ROOT=/data/... scripts/scenes/fipt_syn_bathroom.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export DATASET=synthetic SCENE=bathroom EXP=fipt_syn_bathroom LDR_IMG_DIR=Image
export DATASET_PATH=${DATASET_ROOT:?set DATASET_ROOT}
export HAS_PART=1 CRF_BASIS=3 RES_SCALE=1.0 VAL_FRAME=10
export SPP=128 spp=32 L_CRF_WEIGHT=0.001
export EPOCHS_INIT=6 EPOCHS_BRDF=4 EPOCHS_EMITTER=1
exec scripts/run_pipeline.sh
