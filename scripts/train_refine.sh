#!/bin/bash
# MF-MDM R training (ref script/train_refine.sh).
python -m oakink2_tamf_tpu.launch.train_r \
    --cfg config/arch_refine.yml \
    --cfg config/loss_param_refine.yml \
    --cfg config/bs_64.yml \
    --cfg config/split.yml \
    --exp_id "refine__?(ts)" \
    "$@"
