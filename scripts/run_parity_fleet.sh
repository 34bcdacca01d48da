#!/bin/bash
# Sequential 3-seed parity fleet (reference protocol: seeds {42,59,88} —
# run_finetune.sh:50, statistics_of_result.py:5-30). Runs nice-d so
# foreground work preempts it; each stage re-emits its PARITY_*.json as a
# mean±std artifact. Order = VERDICT round-3 priority (ELECTRA outlier
# first).
set -u
cd /root/repo
R=/root/repo
W=/tmp/parity_fleet
mkdir -p "$W"
LOG="$W/fleet.log"
run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name" >> "$LOG"
  nice -n 19 python scripts/parity_multiseed.py "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] DONE $name rc=$?" >> "$LOG"
}

run electra  --harness parity_e2e --workdir "$W/electra" --hp trunk=electra --out "$R/PARITY_E2E_ELECTRA.json"
run bert     --harness parity_e2e --workdir "$W/bert" --out "$R/PARITY_E2E.json"
run aid      --harness parity_aid --workdir "$W/aid" --out "$R/PARITY_AID.json"
run kpe      --harness parity_kpe --workdir "$W/kpe" --out "$R/PARITY_KPE.json"
run mug      --harness parity_mug --workdir "$W/mug" --out "$R/PARITY_MUG.json"
run mug_es   --harness parity_mug --workdir "$W/mug_es" --kw track=extractive_summarization --out "$R/PARITY_MUG_ES.json"
run mmvts    --harness parity_mmvts --workdir "$W/mmvts" --out "$R/PARITY_MMVTS.json"
run longformer --harness parity_e2e --workdir "$W/longformer" --hp trunk=longformer --out "$R/PARITY_E2E_LONGFORMER.json"
run bigbird  --harness parity_e2e --workdir "$W/bigbird" --hp trunk=bigbird --out "$R/PARITY_E2E_BIGBIRD.json"
echo "=== [$(date +%H:%M:%S)] FLEET COMPLETE" >> "$LOG"
