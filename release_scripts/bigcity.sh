#!/bin/bash
# MatrixCity BigCity aerial training — analogue of release_scripts/bigcity.sh
# (bsz 64, 500k iters, densification off, sparse adam, ocean mask; SURVEY.md §6).

set -e
DATA=${1:?matrixcity root}
OUT=${2:?output root}
STRAT=${3:-clm_offload}

python -m clm_gs_tpu.train \
  -s "$DATA" -m "$OUT/bigcity_${STRAT}" \
  --$STRAT --eval --bsz 64 --iterations 500000 \
  --disable_auto_densification --sparse_adam \
  --matrixcity_ocean_mask \
  --test_iterations 100000 300000 500000 \
  --save_iterations 500000 \
  --lr_scale_mode sqrt

python release_scripts/log2csv.py "$OUT/bigcity_${STRAT}" -o "$OUT/bigcity_${STRAT}.csv"
