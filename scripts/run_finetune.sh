#!/usr/bin/env bash
# Topic-segmentation fine-tune — the reference recipe
# (reference: emnlp2023-topic_segmentation/run_finetune.sh:14-46: longformer
# base, seq 2048, lr 5e-5, 5 epochs, effective batch 8, ts/tssp/cl weights
# 1.0/1.0/0.5, cl_temp 0.1, cl_anchor_level eop_list, seeds 42 59 88).
set -euo pipefail

MODEL=${MODEL:-""}                 # local HF checkpoint dir (optional)
DATASET=${DATASET:-wiki_section}
DATA_DIR=${DATA_DIR:-./data/${DATASET}}
OUT=${OUT:-./output/${DATASET}_finetune}
MAX_SEQ=${MAX_SEQ:-2048}

python -m spokennlp_tpu.cli.run_finetune \
    ${MODEL:+--model_name_or_path "$MODEL"} \
    --dataset_name "$DATASET" \
    --data_dir "$DATA_DIR" \
    --output_dir "$OUT" \
    --do_train --do_eval --do_predict \
    --attention_type sliding_window \
    --attention_window 512 \
    --max_seq_length "$MAX_SEQ" \
    --learning_rate 5e-5 \
    --num_train_epochs 5 \
    --per_device_train_batch_size 2 \
    --gradient_accumulation_steps 4 \
    --ts_loss_weight 1.0 \
    --tssp_loss_weight 1.0 --do_tssp --do_da_ts \
    --cl_loss_weight 0.5 --cl_temp 0.1 --cl_anchor_level eop_list \
    --threshold 0.5 \
    --dtype bfloat16 \
    --seeds 42 59 88
