"""Cross-framework MUG Track-3 quality parity (scripts/parity_titlegen.py).

Eighth system-level proof next to tests/test_reference_parity_{e2e,aid,sld,
mmvts,ditto,mug,kpe}.py, closing the last MUG track: a torch oracle of the
PALM 2.0 architecture (pre-norm OpenNMT decoder + pointer-generator, the
semantics models/palm.py implements and tests/test_palm.py pins
structurally) and this framework's run_title_generation CLI train on the
same synthetic meeting corpus from the SAME palm_v2-layout checkpoint
(exercising hf_convert.palm_to_params on a real torch state-dict file) and
must land on the same multi-reference rouge-1 F (the challenge evaluator's
Track-3 metric; reference: alimeeting4mug/src/topic_title_generation/
palm_subtitle_generation.py:371-396 + challenge_evaluate.py:349).

The converged run is gated behind RUN_SLOW=1; the smoke test runs two
epochs and validates the full machinery (shared checkpoint, both training
loops, beam decode, rouge). The committed artifact of a converged 3-seed
run lives at PARITY_TITLEGEN.json.
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_titlegen  # noqa: E402


def test_titlegen_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_titlegen.HP(), epochs=2)
    result = parity_titlegen.run_parity(str(tmp_path), hp)
    assert set(result["abs_delta"]) == {"rouge1_f", "rougel_f"}
    assert os.path.exists(tmp_path / "parity_titlegen_results.json")
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["rouge1_f"] <= 1.0


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run (RUN_SLOW=1)"
)
def test_titlegen_parity_full_converged(tmp_path):
    result = parity_titlegen.run_parity(str(tmp_path), parity_titlegen.HP())
    assert result["pass"], result
    # both sides must learn to copy the planted title words (the trivial
    # no-copy baseline sits near 0 rouge against 2-word references)
    assert result["torch"]["rouge1_f"] > 0.5, result
    assert result["jax"]["rouge1_f"] > 0.5, result
    assert result["abs_delta"]["rouge1_f"] <= 0.2


def test_committed_titlegen_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "PARITY_TITLEGEN.json"
    )
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["rouge1_f"] <= 0.2
    # converged, not vacuous: both sides well above the no-learning floor
    assert result["torch"]["rouge1_f"] > 0.5
    assert result["jax"]["rouge1_f"] > 0.5
    # 3-seed mean±std protocol (the reference's run_finetune.sh:50)
    assert len(result.get("seeds", [])) >= 3
