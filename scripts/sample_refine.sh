#!/bin/bash
# Refined save_dict trees for the metrics (ref script/sample_refine.sh).
# usage: scripts/sample_refine.sh <split> <refine_ckpt> [extra flags]
SPLIT=${1:?split}; MODEL=${2:?refine ckpt}; shift 2
python -m oakink2_tamf_tpu.launch.sample_r \
    --cfg config/arch_refine.yml \
    --cfg config/split.yml \
    --sample.split "$SPLIT" \
    --sample.model_filepath "$MODEL" \
    "$@"
