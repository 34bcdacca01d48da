"""Cross-framework MUG Track-1 quality parity (scripts/parity_mug.py).

Sixth system-level proof next to tests/test_reference_parity_{e2e,aid,sld,
mmvts,ditto}.py, and the one that closes the PoNet fidelity risk at the
system level: a torch oracle of the documented ModelScope PoNet layout and
this framework's run_mug CLI train on the same synthetic AMC-style meeting
corpus from the SAME converted ModelScope-layout checkpoint and must land
on the same challenge positive F1 (official evaluator on both sides;
reference: alimeeting4mug/src/topic_segment/ponet_topic_segmentation.py +
src/utils/challenge_evaluate.py:167).

The converged run is gated behind RUN_SLOW=1; the smoke test runs two
epochs on a reduced corpus and validates the full machinery (shared
checkpoint conversion, both training loops, official scoring). The
committed artifact of a converged run lives at PARITY_MUG.json.
"""

import dataclasses
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_mug  # noqa: E402


def test_mug_parity_harness_smoke(tmp_path):
    hp = dataclasses.replace(parity_mug.HP(), epochs=1)
    result = parity_mug.run_parity(str(tmp_path), hp, n_train=8, n_dev=4)
    assert set(result["abs_delta"]) == {"pos_f1", "score"}
    assert os.path.exists(tmp_path / "parity_mug_results.json")
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["pos_f1"] <= 1.0
        assert result[side]["epochs"] == 1


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="converged parity run (RUN_SLOW=1)"
)
def test_mug_parity_full_converged(tmp_path):
    result = parity_mug.run_parity(str(tmp_path), parity_mug.HP())
    assert result["pass"], result
    # both sides must learn the lexical cue (Bayes F1 ~0.9+; the all-positive
    # trivial baseline sits ~0.57 at the corpus' ~40% boundary rate)
    assert result["torch"]["pos_f1"] > 0.7, result
    assert result["jax"]["pos_f1"] > 0.7, result
    assert result["abs_delta"]["pos_f1"] <= 0.2


def test_committed_mug_parity_artifact_passes_gate():
    """The committed converged-run artifact must itself satisfy the gate."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_MUG.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["pos_f1"] <= 0.2
    assert result["torch"]["pos_f1"] > 0.7
    assert result["jax"]["pos_f1"] > 0.7


def test_mug_es_parity_harness_smoke(tmp_path):
    """Track 2 (topic-level extractive summarization) through the same
    shared-checkpoint PoNet oracle vs run_mug --track extractive_
    summarization, scored by the multi-reference rouge of the reference's
    compute_metrics (:853-979)."""
    hp = dataclasses.replace(parity_mug.HP(), epochs=1)
    result = parity_mug.run_parity(str(tmp_path), hp, n_train=8, n_dev=4,
                                   track="extractive_summarization")
    assert set(result["abs_delta"]) == {"rouge1_f", "rougel_f"}
    for side in ("torch", "jax"):
        assert 0.0 <= result[side]["rouge1_f"] <= 1.0


def test_committed_mug_es_parity_artifact_passes_gate():
    """The committed converged Track-2 artifact must satisfy the gate.
    The ~0.68 plateau is the corpus' rouge ceiling under the evaluator's
    Chinese-style ""-join tokenization (identical on both sides), not an
    undertrained model — training loss is <0.005 on both."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_MUG_ES.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["track"] == "extractive_summarization"
    assert result["abs_delta"]["rouge1_f"] <= 0.2
    assert result["torch"]["rouge1_f"] > 0.5
    assert result["jax"]["rouge1_f"] > 0.5
