"""Cross-framework SLD quality parity (scripts/parity_sld.py).

Third system-level proof next to tests/test_reference_parity_{e2e,aid}.py:
the reference's stage-7 trainer (torch oracle faithful to
sld/.../run_clm.py:787-831 loss, :788-791 time-masking, :647-745 decode)
and this framework's run_sld CLI train on the same synthetic
speech-token→text corpus and must land on the same best dev WER.

The converged run takes ~1.5 h on CPU, so it is gated behind RUN_SLOW=1;
the smoke test runs one epoch on a reduced corpus and validates the full
machinery (packing → both trainers → generate/decode → shared WER → gate).
The committed artifact of a converged run lives at PARITY_SLD.json.
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_sld  # noqa: E402


def test_sld_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_sld.HP(), epochs=1)
    result = parity_sld.run_parity(str(tmp_path), hp, n_train=48, n_eval=8)
    assert set(result["abs_delta"]) == {"wer"}
    assert os.path.exists(tmp_path / "parity_sld_results.json")
    for side in ("torch", "jax"):
        assert result[side]["wer"] >= 0.0
        assert result[side]["epochs"] == 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run (RUN_SLOW=1)"
)
def test_sld_parity_full_converged(tmp_path):
    result = parity_sld.run_parity(str(tmp_path), parity_sld.HP())
    assert result["pass"], result
    # both sides must actually learn the code (undertrained babble sits
    # at WER >= ~0.9) AND sit on the nonzero homophone floor (~0.25): a
    # saturated WER 0.0 artifact discriminates nothing (round-3 VERDICT)
    assert 0.05 <= result["torch"]["wer"] < 0.5, result
    assert 0.05 <= result["jax"]["wer"] < 0.5, result
    assert result["abs_delta"]["wer"] <= 0.2


def test_committed_sld_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate,
    at a NONZERO operating point (homophone corpus WER floor ~0.25)."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_SLD.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["wer"] <= 0.2
    assert 0.05 <= result["torch"]["wer"] < 0.5
    assert 0.05 <= result["jax"]["wer"] < 0.5
    assert result.get("operating_point_ok", False)
