#!/usr/bin/env bash
# Raw corpora -> unified jsonl (reference: preprocess_data.py __main__).
set -euo pipefail
DATASET=${1:?usage: run_process_data.sh <wiki_section|wiki727k|wiki50|wiki_elements> <raw_dir> <out_dir>}
RAW=${2:?raw data folder}
OUT=${3:?output folder}
python -m spokennlp_tpu.cli.run_process_data --dataset "$DATASET" \
    --data_folder "$RAW" --out_folder "$OUT"
