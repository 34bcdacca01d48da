"""Cross-framework Ditto quality parity (scripts/parity_ditto.py).

Inference-only, so the full converged run is only a couple of minutes and
runs un-gated: the reference's Diagonal Attention Pooling math verbatim
(evaluation_ditto.py:120-155, materializing the attentions) vs our
analytic-diagonal path through run_ditto, scored by STS Spearman on
graded synthetic pairs from the same random trunk. Ditto is learning-free
(no training, hence no seed axis — unlike the other parity fleets); the
proof is exact per config, spanning the reference's (layer, head) recipe
axis (run_eval_ditto.sh:17-37). Committed artifact: PARITY_DITTO.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_ditto  # noqa: E402


def test_ditto_parity_recipe_table(tmp_path):
    result = parity_ditto.run_parity_table(str(tmp_path))
    assert result["pass"], result
    assert len(result["configs"]) == len(parity_ditto.RECIPE_TABLE)
    for cfg in result["configs"]:
        # both sides must actually rank (graded-overlap pairs are rankable)
        assert cfg["torch"]["spearman"] > 0.7
        assert cfg["jax"]["spearman"] > 0.7
        assert cfg["abs_delta"]["spearman"] <= 0.02
    # top level reports the worst config
    worst = max(c["abs_delta"]["spearman"] for c in result["configs"])
    assert result["abs_delta"]["spearman"] == worst


def test_committed_ditto_parity_artifact_passes_gate():
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_DITTO.json")
    with open(path) as f:
        result = json.load(f)
    assert result["pass"]
    assert result["abs_delta"]["spearman"] <= 0.02
    assert result["torch"]["spearman"] > 0.7
    assert result["jax"]["spearman"] > 0.7
    # multi-config recipe-table artifact: every config inside the gate
    for cfg in result["configs"]:
        assert cfg["pass"]
        assert cfg["abs_delta"]["spearman"] <= 0.02
