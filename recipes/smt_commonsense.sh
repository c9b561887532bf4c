#!/usr/bin/env bash
# Reference-recipe parity run (deepspeed/README.md:34-63 of the reference,
# adapted to this framework's launcher). Requires a local HF checkpoint and
# the commonsense_170k.json corpus (no hub egress on TPU pods).
#
# Usage: MODEL=/ckpts/DeepSeek-R1-Distill-Llama-8B \
#        DATA=/data/commonsense_170k.json \
#        OUT=/runs/smt_commonsense \
#        bash recipes/smt_commonsense.sh
set -euo pipefail
: "${MODEL:?set MODEL to a local HF checkpoint dir}"
: "${DATA:?set DATA to commonsense_170k.json}"
: "${OUT:?set OUT to an output dir}"

python -m sparse_matrix_tuning_tpu.cli.fine_tune \
    --model_name_or_path "$MODEL" \
    --data_path "$DATA" \
    --per_device_ft_batch_size 16 \
    --per_device_eval_batch_size 16 \
    --max_seq_len 2048 \
    --ft_learning_rate 9.865e-6 \
    --num_ft_epochs 3 \
    --lr_warmup_steps 100 \
    --seed 1234 \
    --smt_lr 9.865e-6 \
    --eval_step 30 \
    --eval_set_ratio 0.2 \
    --matrix_sparsity \
    --selection_strategy no_restriction \
    --calculate_strategy abs_mean \
    --downsample_mlp_blocks_ratio 0.0084 \
    --downsample_attention_blocks_ratio 0.0084 \
    --full_ft_steps 100 \
    --smt_lr_warmup_steps 0 \
    --output_dir "$OUT"
