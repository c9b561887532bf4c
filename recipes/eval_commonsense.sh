#!/usr/bin/env bash
# Reference eval-harness parity (deepspeed/README.md:65-85): beam-4,
# repetition penalty 1.1, the 8 commonsense datasets.
# Usage: MODEL=/runs/smt_commonsense/final DATA=/data/commonsense \
#        OUT=/runs/smt_commonsense/eval bash recipes/eval_commonsense.sh
set -euo pipefail
: "${MODEL:?}"; : "${DATA:?}"; : "${OUT:?}"

python -m sparse_matrix_tuning_tpu.cli.run_commonsense \
    --model_name_or_path "$MODEL" \
    --data_path "$DATA" \
    --datasets boolq piqa social_i_qa hellaswag winogrande \
               ARC-Challenge ARC-Easy openbookqa \
    --per_device_eval_batch_size 16 \
    --output_dir "$OUT"
