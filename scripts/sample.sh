#!/bin/bash
# Batched G sampling over a split (ref script/sample.sh).
# usage: scripts/sample.sh <split> <model_ckpt> [extra flags]
SPLIT=${1:?split}; MODEL=${2:?model ckpt}; shift 2
python -m oakink2_tamf_tpu.launch.sample_g \
    --cfg config/arch_mdm_l.yml \
    --cfg config/split.yml \
    --sample.split "$SPLIT" \
    --sample.model_filepath "$MODEL" \
    "$@"
