#!/bin/bash
# MF-MDM G training with the reference's config stack (ref script/train.sh).
# Point the cache/asset paths at your OakInk2 prep (see README) first.
python -m oakink2_tamf_tpu.launch.train_g \
    --cfg config/data_reverse_segment.yml \
    --cfg config/arch_mdm_l.yml \
    --cfg config/loss_param.yml \
    --cfg config/bs_64.yml \
    --cfg config/split.yml \
    --exp_id "main__?(ts)" \
    "$@"
