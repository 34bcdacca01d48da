#!/bin/bash
# Round-5 parity-fleet regeneration: every 3-seed artifact re-run on the
# longseg corpus profile (segeval k >= 2 -> WinDiff is a real second gate,
# round-4 verdict weak #1) with the stabilized harnesses (symmetric grad
# clipping for titlegen/sld, 20-epoch KPE oracle) and the tightened
# min(gate, max(2*sigma_torch, 0.05)) pass criterion.
#
# CPU-only by construction: JAX_PLATFORMS=cpu alone does NOT steer this
# container to CPU (the baked sitecustomize force-registers the TPU
# backend); PALLAS_AXON_POOL_IPS must be unset too.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
W=${FLEET_WORKDIR:-/tmp/parity_fleet3}
mkdir -p "$W"

run() {
  name=$1; shift
  echo "=== $name start $(date +%T)" >> "$W/queue.log"
  python scripts/parity_multiseed.py "$@" > "$W/$name.log" 2>&1
  echo "=== $name exit $? $(date +%T)" >> "$W/queue.log"
}

run kpe      --harness parity_kpe      --workdir "$W/kpe"      --out PARITY_KPE.json
run titlegen --harness parity_titlegen --workdir "$W/titlegen" --out PARITY_TITLEGEN.json
run sld      --harness parity_sld      --workdir "$W/sld"      --out PARITY_SLD.json
run e2e_bert --harness parity_e2e      --workdir "$W/e2e_bert" --out PARITY_E2E.json
run e2e_lf   --harness parity_e2e      --workdir "$W/e2e_lf"   --hp trunk=longformer --out PARITY_E2E_LONGFORMER.json
run e2e_el   --harness parity_e2e      --workdir "$W/e2e_el"   --hp trunk=electra --out PARITY_E2E_ELECTRA.json
run e2e_bb   --harness parity_e2e      --workdir "$W/e2e_bb"   --hp trunk=bigbird --out PARITY_E2E_BIGBIRD.json
run e2e_cos  --harness parity_e2e      --workdir "$W/e2e_cos"  --hp ts_score_predictor=cos --extra_gate_keys f1 --out PARITY_E2E_COS.json
echo "FLEET3 COMPLETE" >> "$W/queue.log"
