"""README parity-table rows must match the committed PARITY_*.json artifacts.

Round-4 verdict found a stale README row (SLD quoting numbers from an older
artifact revision). This test re-derives every decimal quoted in a README
table row whose first cell names a PARITY artifact and checks it is some
value present in that artifact, rounded to the quoted precision — so table
rows cannot silently go stale again.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

_NUM = re.compile(r"(?<![\d.])(\d+\.\d+)(?![\d.])")


def _flatten(obj, out):
    if isinstance(obj, dict):
        for v in obj.values():
            _flatten(v, out)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _flatten(v, out)
    elif isinstance(obj, bool):
        pass
    elif isinstance(obj, (int, float)):
        out.append(float(obj))


def _artifact_rows():
    with open(os.path.join(REPO, "README.md")) as f:
        lines = f.readlines()
    rows = []
    for ln in lines:
        m = re.match(r"\s*\|\s*`(PARITY_[A-Z0-9_]+\.json)`\s*\|", ln)
        if m:
            rows.append((m.group(1), ln))
    return rows


ROWS = _artifact_rows()


def test_readme_has_parity_table():
    assert len(ROWS) >= 10, "README parity table missing or truncated"


@pytest.mark.parametrize("artifact,row", ROWS, ids=[a for a, _ in ROWS])
def test_readme_row_matches_artifact(artifact, row):
    path = os.path.join(REPO, artifact)
    assert os.path.exists(path), f"README row cites missing artifact {artifact}"
    with open(path) as f:
        data = json.load(f)
    values: list[float] = []
    _flatten(data, values)
    # quoted deltas are |a - b| of artifact values in a few rows; admit
    # pairwise absolute differences of headline-ish values too
    small = sorted({round(v, 6) for v in values if 0 <= v <= 1000})
    diffs = set()
    for i, a in enumerate(small):
        for b in small[i + 1:]:
            d = round(b - a, 6)
            if d <= 1.0:
                diffs.add(d)
    pool = set(small) | diffs

    for tok in _NUM.findall(row):
        quoted = float(tok)
        decimals = len(tok.split(".")[1])
        tol = 0.5 * 10 ** (-decimals) + 1e-9
        ok = any(abs(quoted - v) <= tol for v in pool)
        assert ok, (
            f"README quotes {tok} for {artifact}, but no value (or pairwise "
            f"delta) in the artifact rounds to it — stale row?"
        )
