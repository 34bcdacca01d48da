"""Cross-framework end-to-end quality parity (scripts/parity_e2e.py).

The system-level proof behind BASELINE.md's "Pk/WinDiff within 0.2" gate:
the reference's first-party torch stack (oracle re-implementation, see
scripts/parity_e2e.py) and this framework's run_finetune CLI fine-tune on
the same synthetic WikiSection corpus from the same random HF BERT trunk and
must land on the same Pk/WD.

The converged run takes ~40 min on one CPU core, so it is gated behind
RUN_SLOW=1 (pytest -m slow); the smoke test always runs and validates the
full machinery (corpus -> both trainers -> shared metrics -> gate logic) in
a couple of train steps. The committed artifact of a full converged run
lives at PARITY_E2E.json (torch pk 0.2061 vs jax pk 0.2159, |dPk| 0.0098).
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_e2e  # noqa: E402


def test_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_e2e.HP(), epochs=1.0)
    result = parity_e2e.run_parity(str(tmp_path), hp)
    assert set(result["abs_delta"]) == {"f1", "pk", "wd"}
    assert os.path.exists(tmp_path / "parity_results.json")
    # undertrained models still produce defined, in-range metrics
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["pk"] <= 1.0
        assert result[side]["train_steps"] >= 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run takes ~40 min (RUN_SLOW=1)"
)
def test_parity_full_converged(tmp_path):
    result = parity_e2e.run_parity(str(tmp_path), parity_e2e.HP())
    assert result["pass"], result
    # both sides must actually learn (guards against an all-O collapse
    # making the gate vacuous)
    assert result["torch"]["pk"] < 0.3, result
    assert result["jax"]["pk"] < 0.3, result
    assert result["abs_delta"]["pk"] <= 0.2
    assert result["abs_delta"]["wd"] <= 0.2


def test_committed_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_E2E.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["pk"] <= 0.2
    assert result["abs_delta"]["wd"] <= 0.2
    assert result["torch"]["pk"] < 0.3
    assert result["jax"]["pk"] < 0.3


def test_parity_harness_smoke_cos(tmp_path):
    """ts_score_predictor=cos drives end-to-end through both sides: the
    torch oracle's BCE-on-adjacent-eop-cosine loss + cos>0 predictions vs
    run_finetune --ts_score_predictor cos (trainer.evaluate cos branch)."""
    hp = dataclasses.replace(parity_e2e.HP(), epochs=1.0,
                             ts_score_predictor="cos")
    result = parity_e2e.run_parity(str(tmp_path), hp)
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["pk"] <= 1.0
        assert result[side]["train_steps"] >= 1


def test_committed_cos_parity_artifact_passes_gate():
    """Converged cos-score-predictor artifact."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_E2E_COS.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["hp"]["ts_score_predictor"] == "cos"
    assert result["abs_delta"]["pk"] <= 0.2
    # advisor r3: Pk alone is a weak gate for cos mode — also bound the F1
    # divergence (3-seed mean; committed artifact is at 0.023)
    assert result["abs_delta"]["f1"] <= 0.1
    assert result["torch"]["pk"] < 0.35
    assert result["jax"]["pk"] < 0.35


def test_parity_harness_smoke_longformer(tmp_path):
    """The reference-flagship trunk (sliding-window attention + roberta
    positions through hf_convert) drives end-to-end through both sides."""
    hp = dataclasses.replace(parity_e2e.HP(), epochs=1.0, trunk="longformer")
    result = parity_e2e.run_parity(str(tmp_path), hp)
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["pk"] <= 1.0
        assert result[side]["train_steps"] >= 1


def test_committed_longformer_parity_artifact_passes_gate():
    """Converged flagship-config artifact (sliding-window trunk)."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "PARITY_E2E_LONGFORMER.json"
    )
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["hp"]["trunk"] == "longformer"
    assert result["abs_delta"]["pk"] <= 0.2
    assert result["torch"]["pk"] < 0.3
    assert result["jax"]["pk"] < 0.3


def test_committed_bigbird_parity_artifact_passes_gate():
    """Converged block-sparse-trunk artifact (exact-attention torch oracle
    vs our bigbird attention type)."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "PARITY_E2E_BIGBIRD.json"
    )
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["hp"]["trunk"] == "bigbird"
    assert result["abs_delta"]["pk"] <= 0.2
    assert result["torch"]["pk"] < 0.3
    assert result["jax"]["pk"] < 0.3


def test_committed_electra_parity_artifact_passes_gate():
    """Converged ELECTRA-trunk artifact, 3-seed mean±std (reference
    protocol). Round-3's single-seed outlier (dPk 0.144, ours -0.25 F1)
    was trajectory noise: at seeds {42,59,88} the mean dPk is 0.0199 with
    per-seed deltas {0.012, 0.008, 0.040} — in line with the other
    trunks."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "PARITY_E2E_ELECTRA.json"
    )
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["hp"]["trunk"] == "electra"
    assert result["abs_delta"]["pk"] <= 0.2
