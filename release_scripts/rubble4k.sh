#!/bin/bash
# Rubble 4K training — analogue of release_scripts/rubble4k.sh
# (bsz 4, 100k iters, llffhold 83; SURVEY.md §6).

set -e
DATA=${1:?dataset root (colmap scene)}
OUT=${2:?output root}
STRAT=${3:-clm_offload}

python -m clm_gs_tpu.train \
  -s "$DATA" -m "$OUT/rubble4k_${STRAT}" \
  --$STRAT --eval --llffhold 83 --bsz 4 --iterations 100000 \
  --densify_until_iter 50000 \
  --test_iterations 7000 30000 60000 100000 \
  --save_iterations 100000 \
  --lr_scale_mode sqrt

python release_scripts/log2csv.py "$OUT/rubble4k_${STRAT}" -o "$OUT/rubble4k_${STRAT}.csv"
