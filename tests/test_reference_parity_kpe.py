"""Cross-framework MUG Track-4 quality parity (scripts/parity_kpe.py).

Seventh system-level proof next to tests/test_reference_parity_{e2e,aid,
sld,mmvts,ditto,mug}.py: a torch BERT + linear-chain-CRF oracle (the
AdaSeq Bert-CRF semantics the reference delegates Track 4 to) and this
framework's run_mug --track keyphrase train on the same synthetic
char-level corpus from the SAME converted BERT trunk and must land on the
same challenge exact F1@15 (official fuzzy-LCS evaluator on both sides;
reference: alimeeting4mug/src/utils/challenge_evaluate.py:499-518).

The converged run is gated behind RUN_SLOW=1; the smoke test runs one
epoch on a reduced corpus and validates the full machinery. The committed
artifact of a converged run lives at PARITY_KPE.json.
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_kpe  # noqa: E402


def test_kpe_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_kpe.HP(), epochs=1)
    result = parity_kpe.run_parity(str(tmp_path), hp, n_train=6, n_dev=3)
    assert set(result["abs_delta"]) == {"exact_f1@15", "partial_f1@15"}
    assert os.path.exists(tmp_path / "parity_kpe_results.json")
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["exact_f1@15"] <= 1.0
        assert result[side]["epochs"] == 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run (RUN_SLOW=1)"
)
def test_kpe_parity_full_converged(tmp_path):
    result = parity_kpe.run_parity(str(tmp_path), parity_kpe.HP())
    assert result["pass"], result
    # the reserved-range pool is fully learnable: both sides near F1 1.0
    assert result["torch"]["exact_f1@15"] > 0.7, result
    assert result["jax"]["exact_f1@15"] > 0.7, result
    assert result["abs_delta"]["exact_f1@15"] <= 0.2


def test_committed_kpe_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_KPE.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["exact_f1@15"] <= 0.2
    assert result["torch"]["exact_f1@15"] > 0.7
    assert result["jax"]["exact_f1@15"] > 0.7
