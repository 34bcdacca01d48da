"""Golden tests for the self-adaptive sliding-window featurizer.

Covers the semantics promised in data/windowing.py: overlap rule (neighboring
windows share one sentence), last-BOS masking, single-over-long-sentence
truncation, and the every-sentence-labeled-once invariant (reference loop:
ts_sentence_seq_labeling.py:814-918).
"""

import numpy as np

from spokennlp_tpu.configs import WindowingConfig
from spokennlp_tpu.data.windowing import (
    IGNORE,
    aggregate_window_predictions,
    stack_windows,
    window_document,
)

CFG = WindowingConfig(
    max_seq_length=16, cls_token_id=101, pad_token_id=0, bos_token_id=1
)


def _doc(sent_lens, labels):
    """Build a synthetic doc: sentence i has tokens [1000+i]*len."""
    return [[1000 + i] * n for i, n in enumerate(sent_lens)], list(labels)


def test_single_window_short_doc():
    sents, labels = _doc([2, 2, 2], [1, 0, 1])
    windows = window_document(sents, labels, CFG)
    assert len(windows) == 1
    w = windows[0]
    # layout: CLS BOS t t BOS t t BOS t t pad...
    assert w.input_ids[0] == CFG.cls_token_id
    bos_positions = np.where(w.input_ids == CFG.bos_token_id)[0]
    np.testing.assert_array_equal(bos_positions, [1, 4, 7])
    # labels at BOS positions; the LAST sentence is masked
    assert w.labels[1] == 1
    assert w.labels[4] == 0
    assert w.labels[7] == IGNORE
    # non-BOS positions ignored
    assert w.labels[2] == IGNORE
    assert w.attention_mask.sum() == 10
    np.testing.assert_array_equal(w.sent_positions[:3], [1, 4, 7])
    np.testing.assert_array_equal(w.sent_mask[:3], [1, 1, 1])
    np.testing.assert_array_equal(w.eop_mask[:3], [1, 1, 0])


def test_overlap_rule_shares_one_sentence():
    # 6 sentences of 4 tokens (5 with BOS): window capacity 16 =>
    # window fills at >= 15 content tokens = 3 sentences.
    sents, labels = _doc([4] * 6, [1, 0, 1, 1, 0, 1])
    windows = window_document(sents, labels, CFG)
    assert len(windows) >= 2
    # first window holds sentences 0..2, last one's label masked
    w0 = windows[0]
    np.testing.assert_array_equal(w0.sent_ids[w0.sent_mask == 1], [0, 1, 2])
    assert w0.sent_labels[2] == IGNORE
    # second window REOPENS with sentence 2 (the shared sentence)
    w1 = windows[1]
    assert w1.sent_ids[0] == 2
    assert w1.sent_labels[0] == labels[2]  # now it receives its label


def test_every_sentence_labeled_exactly_once_except_last():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 30))
        sent_lens = rng.integers(1, 8, size=n).tolist()
        labels = rng.integers(0, 2, size=n).tolist()
        sents, labels = _doc(sent_lens, labels)
        windows = window_document(sents, labels, CFG)
        labeled = []
        for w in windows:
            for sid, lab, m in zip(w.sent_ids, w.sent_labels, w.sent_mask):
                if m and lab != IGNORE:
                    labeled.append(int(sid))
        # each sentence except the doc-final one labeled exactly once
        # (sentences that form single-sentence windows lose their label too)
        assert len(labeled) == len(set(labeled))
        assert (n - 1) not in labeled


def test_long_sentence_truncated_not_shared():
    # one 40-token sentence exceeds the window; it is its own window
    sents, labels = _doc([40, 2], [0, 1])
    windows = window_document(sents, labels, CFG)
    assert len(windows) == 2
    w0 = windows[0]
    assert w0.attention_mask.sum() == CFG.max_seq_length  # truncated full
    assert w0.sent_labels[0] == IGNORE  # single-sentence window => masked
    # next window starts fresh with sentence 1, not sharing sentence 0
    assert windows[1].sent_ids[0] == 1


def test_label_consistency_token_vs_sentence_arrays():
    sents, labels = _doc([3, 2, 4, 2, 3], [0, 1, 0, 1, 1])
    for w in window_document(sents, labels, CFG):
        for k in range(len(w.sent_positions)):
            if w.sent_mask[k]:
                assert w.labels[w.sent_positions[k]] == w.sent_labels[k]


def test_aggregation_roundtrip():
    sents, labels = _doc([4] * 7, [1, 0, 1, 1, 0, 1, 0])
    windows = window_document(sents, labels, CFG, example_id=0)
    batch = stack_windows(windows)
    # fake logits: one-hot of the true label => predictions == labels
    N, L = batch["labels"].shape
    scores = np.zeros((N, L, 2), dtype=np.float32)
    for i in range(N):
        for j in range(L):
            if batch["labels"][i, j] != IGNORE:
                scores[i, j, batch["labels"][i, j]] = 5.0
    docs = aggregate_window_predictions(
        batch["example_id"], batch["labels"], scores, num_examples=1
    )
    # doc 0 collects all labeled sentences, in order, each exactly once
    got = docs[0]["labels"]
    want = [l for l in _labels_after_windowing(sents, labels)]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.argmax(docs[0]["scores"], -1), got)


def _labels_after_windowing(sents, labels):
    """Expected label sequence: every sentence labeled once except those lost
    to single-sentence windows and the doc-final sentence."""
    windows = window_document(sents, labels, CFG)
    out = []
    for w in windows:
        for lab, m in zip(w.sent_labels, w.sent_mask):
            if m and lab != IGNORE:
                out.append(int(lab))
    return out
