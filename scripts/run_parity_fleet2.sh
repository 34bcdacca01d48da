#!/bin/bash
# Fleet stage 2: waits for stage 1 (run_parity_fleet.sh) to finish, then
# re-runs the two harnesses whose OPERATING POINT changed this round:
#   - SLD at the nonzero homophone WER floor (round-3 VERDICT weak #3)
#   - cos score-predictor at longer convergence, gated on F1 as well as Pk
#     (round-3 ADVICE medium)
set -u
cd /root/repo
R=/root/repo
W=/tmp/parity_fleet
mkdir -p "$W"
LOG="$W/fleet2.log"

while ! grep -q "FLEET COMPLETE" "$W/fleet.log" 2>/dev/null; do sleep 60; done

run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name" >> "$LOG"
  nice -n 19 python "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] DONE $name rc=$?" >> "$LOG"
}

run sld scripts/parity_sld.py --workdir "$W/sld" || true
cp "$W/sld/parity_sld_results.json" "$R/PARITY_SLD.json" 2>>"$LOG" || true

run cos scripts/parity_multiseed.py --harness parity_e2e \
    --workdir "$W/cos" --hp ts_score_predictor=cos --hp epochs=450.0 \
    --extra_gate_keys f1 --out "$R/PARITY_E2E_COS.json"

echo "=== [$(date +%H:%M:%S)] FLEET2 COMPLETE" >> "$LOG"
