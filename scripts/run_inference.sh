#!/usr/bin/env bash
# Topic-segmentation inference — the north-star benchmark path
# (reference: emnlp2023-topic_segmentation/run_inference.sh).
set -euo pipefail

MODEL=${MODEL:-""}
DATASET=${DATASET:-wiki_section}
DATA_DIR=${DATA_DIR:-./data/${DATASET}}
OUT=${OUT:-./output/${DATASET}_inference}

python -m spokennlp_tpu.cli.run_inference \
    ${MODEL:+--model_name_or_path "$MODEL"} \
    --dataset_name "$DATASET" \
    --data_dir "$DATA_DIR" \
    --output_dir "$OUT" \
    --do_predict \
    --max_seq_length 512 \
    --per_device_eval_batch_size 32 \
    --threshold 0.5 --topk 10 --f1_at_k 1 \
    --dtype bfloat16
