#!/bin/bash
# FID encoder training (ref script/train_encoder.sh).
python -m oakink2_tamf_tpu.launch.train_encoder \
    --cfg config/arch_encoder.yml \
    --cfg config/split.yml \
    --train.batch_size 256 \
    --train.scheduler_milestone 80,160,240,320 \
    --exp_id "encoder__?(ts)" \
    "$@"
