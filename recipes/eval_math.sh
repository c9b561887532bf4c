#!/usr/bin/env bash
# Math-reasoning eval (README tables rows: GSM8k/SingleEq/SVAMP/MultiArith/
# AddSub/AQuA; extraction follows the LLM-Adapters convention).
# Usage: MODEL=... DATA=... OUT=... bash recipes/eval_math.sh
set -euo pipefail
: "${MODEL:?}"; : "${DATA:?}"; : "${OUT:?}"

python -m sparse_matrix_tuning_tpu.cli.run_commonsense \
    --model_name_or_path "$MODEL" \
    --data_path "$DATA" \
    --datasets gsm8k SingleEq SVAMP MultiArith AddSub AQuA \
    --per_device_eval_batch_size 16 \
    --max_new_tokens 512 \
    --output_dir "$OUT"
