#!/usr/bin/env bash
# scannetpp_bathroom2: reference scripts/scannetpp/bathroom2/train.sh budgets, mapped onto our stage CLIs.
# Usage: DATASET_ROOT=/data/... scripts/scenes/scannetpp_bathroom2.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export DATASET=scannetpp SCENE=45b0dac5e3 EXP=scannetpp_bathroom2 LDR_IMG_DIR=Image
export DATASET_PATH=${DATASET_ROOT:?set DATASET_ROOT}
export HAS_PART=0 CRF_BASIS=3 RES_SCALE=0.5 VAL_FRAME=0
export SPP=128 spp=32 L_CRF_WEIGHT=0.001
export EPOCHS_INIT=5 EPOCHS_BRDF=2 EPOCHS_EMITTER=1
exec scripts/run_pipeline.sh
