"""Cross-framework Ditto quality parity (scripts/parity_ditto.py).

Inference-only, so the full converged run is only a couple of minutes and
runs un-gated: the reference's Diagonal Attention Pooling math verbatim
(evaluation_ditto.py:120-155, materializing the attentions) vs our
analytic-diagonal path through run_ditto, scored by STS Spearman on
graded synthetic pairs from the same random trunk. Committed artifact:
PARITY_DITTO.json (|dSpearman| 0.0061 vs a 0.02 gate).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_ditto  # noqa: E402


def test_ditto_parity_full(tmp_path):
    result = parity_ditto.run_parity(str(tmp_path), parity_ditto.HP())
    assert result["pass"], result
    # both sides must actually rank (graded-overlap pairs are rankable)
    assert result["torch"]["spearman"] > 0.7
    assert result["jax"]["spearman"] > 0.7
    assert result["abs_delta"]["spearman"] <= 0.02


def test_committed_ditto_parity_artifact_passes_gate():
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_DITTO.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["spearman"] <= 0.02
    assert result["torch"]["spearman"] > 0.7
    assert result["jax"]["spearman"] > 0.7
