"""The parity-harness corpus profiles must keep WinDiff a real second gate.

Round-4 verdict (weak #1): with the legacy 2-5-sentence topics, segeval's
window size k = round(mean_mass / 2) (reference seqeval.py:173-237,
eval/seg_metrics.py:130-133) lands at k = 1, where WinDiff mathematically
reduces to Pk — every pk/wd pair in the committed artifacts was bit-identical
and the "Pk AND WD within 0.2" gate was really one metric. The "longseg"
profile (the harness default since round 5) draws 2-12-sentence topics so
k >= 2 AND keeps a short-topic tail (segments shorter than k are the only
place WD can diverge from Pk: two boundaries inside one k-window).
"""

import random
import sys

sys.path.insert(0, "scripts")

import parity_e2e  # noqa: E402
from spokennlp_tpu.eval.seg_metrics import (  # noqa: E402
    _window_size,
    compute_window_metric,
    mass_from_boundary_labels,
)


def _doc_masses(profile, n_docs=64, seed=7):
    rng = random.Random(seed)
    per_doc = []
    for _ in range(n_docs):
        doc = parity_e2e.gen_document(rng, profile)
        # the harness metric runs at LIVE-LABEL granularity: the featurizer
        # keeps only paragraph-final sentences (raw label != -100), so the
        # segmentation unit is the paragraph and mass = paragraphs/topic
        units = [v for v in doc["labels"] if v != -100]
        boundaries = [1 if v == 1 else 0 for v in units]
        assert boundaries[-1] == 1, "every doc ends on a topic boundary"
        per_doc.append(mass_from_boundary_labels(boundaries))
    return per_doc


def test_legacy_profile_is_degenerate():
    """Documents WHY the default changed: legacy k is 1 or 2 borderline."""
    ks = [_window_size(m) for m in _doc_masses("legacy")]
    assert sum(1 for k in ks if k <= 1) > len(ks) * 0.3


def test_longseg_k_at_least_two_with_short_tail():
    per_doc = _doc_masses("longseg")
    ks = [_window_size(m) for m in per_doc]
    frac = sum(1 for k in ks if k >= 2) / len(ks)
    assert frac >= 0.9, f"k must be >= 2 almost everywhere, got frac {frac}"
    # the WD-divergence condition: some segments shorter than the doc's k
    short = sum(1 for m, k in zip(per_doc, ks) for s in m if s < k)
    assert short > 0, "no short-segment tail -> WD degenerates to Pk again"


def test_fullscale_k_at_least_two():
    ks = [_window_size(m) for m in _doc_masses("fullscale")]
    frac = sum(1 for k in ks if k >= 2) / len(ks)
    assert frac >= 0.9


def test_fullscale_sentences_fill_512_windows():
    """fullscale exists so 512-token windows are realistically filled
    (round-4 verdict missing #1: quality was only ever measured at L=128)."""
    rng = random.Random(3)
    docs = [parity_e2e.gen_document(rng, "fullscale") for _ in range(16)]
    lens = [len(s.split()) + 1 for d in docs for s in d["sentences"]]  # +BOS
    mean_len = sum(lens) / len(lens)
    assert 14 <= mean_len <= 28
    doc_tokens = [sum(len(s.split()) + 1 for s in d["sentences"]) for d in docs]
    assert sum(doc_tokens) / len(doc_tokens) > 512, "docs must span >1 window"


def test_longseg_wd_detects_near_miss_where_pk_forgives_less():
    """A near-miss boundary (off by one) inside a k-window: on the longseg
    shape WD and Pk are genuinely different numbers (the r04 artifacts had
    them bit-identical on every row)."""
    rng = random.Random(11)
    refs, preds = [], []
    for _ in range(24):
        doc = parity_e2e.gen_document(rng, "longseg")
        units = [v for v in doc["labels"] if v != -100]
        ref = [1 if v == 1 else 0 for v in units]
        # prediction: shift every boundary one sentence early + one spurious
        pred = [0] * len(ref)
        for i, v in enumerate(ref):
            if v and i > 0:
                pred[i - 1] = 1
        pred[len(pred) // 2] = 1
        pred[-1] = 1
        refs.append(pred)
        preds.append(ref)
    m = compute_window_metric(preds, refs)
    assert m["pk"] != m["wd"], "WD must measure something Pk doesn't"
