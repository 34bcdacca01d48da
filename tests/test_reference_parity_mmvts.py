"""Cross-framework MMVTS quality parity (scripts/parity_mmvts.py).

Fourth system-level proof next to tests/test_reference_parity_{e2e,aid,sld}.py:
the reference's multimodal stack (torch oracle faithful to
mmvts/src/models — projector/ma cross-encoder/linear predictor/CE +
modality InfoNCE + matrix topic CL) and this framework's
run_finetune_multimodal CLI train on the same synthetic video corpus
(clip transcripts + cached visual features) from the same random BERT
trunk and must land on the same clip-level F1.

The converged run takes ~1.5 h on CPU, so it is gated behind RUN_SLOW=1;
the smoke test runs one epoch on a reduced corpus and validates the full
machinery. The committed artifact of a converged run lives at
PARITY_MMVTS.json.
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_mmvts  # noqa: E402


def test_mmvts_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_mmvts.HP(), epochs=1)
    result = parity_mmvts.run_parity(str(tmp_path), hp, n_train=12, n_dev=6)
    assert set(result["abs_delta"]) == {"clip_f1"}
    assert os.path.exists(tmp_path / "parity_mmvts_results.json")
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["clip_f1"] <= 1.0
        assert result[side]["epochs"] == 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run (RUN_SLOW=1)"
)
def test_mmvts_parity_full_converged(tmp_path):
    result = parity_mmvts.run_parity(str(tmp_path), parity_mmvts.HP())
    assert result["pass"], result
    # both sides must beat the all-positive trivial baseline (~0.44 at the
    # corpus' ~28% boundary rate); the torch probe converges to ~0.99
    assert result["torch"]["clip_f1"] > 0.6, result
    assert result["jax"]["clip_f1"] > 0.6, result
    assert result["abs_delta"]["clip_f1"] <= 0.2


def test_committed_mmvts_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_MMVTS.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["clip_f1"] <= 0.2
    assert result["torch"]["clip_f1"] > 0.6
    assert result["jax"]["clip_f1"] > 0.6
