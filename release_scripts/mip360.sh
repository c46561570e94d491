#!/bin/bash
# Mip-NeRF 360 training runs — analogue of the reference's
# release_scripts/mip360.sh (same hyperparameters, SURVEY.md §6).
#
# Usage: bash release_scripts/mip360.sh <dataset_root> <output_root> [strategy]
#   strategy: no_offload | naive_offload | clm_offload (default clm_offload)

set -e
DATA=${1:?dataset root}
OUT=${2:?output root}
STRAT=${3:-clm_offload}

SCENES="bicycle bonsai counter garden kitchen room stump"
for SCENE in $SCENES; do
  echo "=== $SCENE ($STRAT) ==="
  python -m clm_gs_tpu.train \
    -s "$DATA/$SCENE" -i images_4 -m "$OUT/${SCENE}_${STRAT}" \
    --$STRAT --eval --bsz 4 --iterations 30000 \
    --test_iterations 7000 15000 30000 \
    --save_iterations 30000 \
    --lr_scale_mode sqrt
done

python release_scripts/log2csv.py "$OUT"/*_${STRAT} -o "$OUT/mip360_${STRAT}.csv"
