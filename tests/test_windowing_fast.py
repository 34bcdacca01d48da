"""window_documents_stacked must equal stack_windows(window_document(...))
bit-exactly on every field — randomized corpora incl. the edge cases the
per-sentence path handles (over-long single sentences, empty sentences,
single-sentence docs, doc-end windows)."""

import numpy as np
import pytest

from spokennlp_tpu.configs import WindowingConfig
from spokennlp_tpu.data.windowing import stack_windows, window_document
from spokennlp_tpu.data.windowing_fast import window_documents_stacked

IGNORE = -100


def _random_docs(rng, n_docs, max_sent_len=12, allow_empty=False,
                 overlong_p=0.02, L=64):
    docs = []
    for _ in range(n_docs):
        n_sent = int(rng.integers(1, 40))
        sents, labels, pairs = [], [], []
        for _ in range(n_sent):
            if allow_empty and rng.random() < 0.05:
                n = 0
            elif rng.random() < overlong_p:
                n = int(rng.integers(L, 3 * L))  # over-long sentence
            else:
                n = int(rng.integers(1, max_sent_len))
            sents.append(rng.integers(10, 1000, size=n).tolist())
            labels.append(int(rng.choice([0, 1, IGNORE])))
            pairs.append(int(rng.choice([0, 1, 2, IGNORE])))
        docs.append({"sent_token_ids": sents, "labels": labels,
                     "pair_orders": pairs})
    return docs


def _reference_stack(docs, cfg, mspw=None):
    windows = []
    for eid, d in enumerate(docs):
        windows.extend(
            window_document(d["sent_token_ids"], d["labels"], cfg, eid,
                            max_sentences_per_window=mspw,
                            pair_orders=d.get("pair_orders"))
        )
    return stack_windows(windows)


@pytest.mark.parametrize("seed,allow_empty,L", [
    (0, False, 64), (1, False, 64), (2, True, 64), (3, False, 32),
    (4, True, 128), (5, False, 512),
])
def test_stacked_equals_reference_path(seed, allow_empty, L):
    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, 20, allow_empty=allow_empty, L=L)
    cfg = WindowingConfig(max_seq_length=L, cls_token_id=2, pad_token_id=0,
                          bos_token_id=1)
    # K must match what stack_windows saw; the default rule depends on
    # whether any sentence is empty — compute it once and pass to both
    K = L if any(len(s) == 0 for d in docs for s in d["sent_token_ids"]) \
        else L // 2 + 1
    ref = _reference_stack(docs, cfg, mspw=K)
    fast = window_documents_stacked(docs, cfg, max_sentences_per_window=K)
    assert set(ref) == set(fast)
    for k in ref:
        np.testing.assert_array_equal(ref[k], fast[k], err_msg=k)


def test_default_k_rule_matches():
    rng = np.random.default_rng(7)
    docs = _random_docs(rng, 8, L=64)
    cfg = WindowingConfig(max_seq_length=64, cls_token_id=2, pad_token_id=0,
                          bos_token_id=1)
    ref = _reference_stack(docs, cfg)
    fast = window_documents_stacked(docs, cfg)
    for k in ref:
        np.testing.assert_array_equal(ref[k], fast[k], err_msg=k)


def test_empty_doc_skipped():
    cfg = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0,
                          bos_token_id=1)
    docs = [
        {"sent_token_ids": [], "labels": []},
        {"sent_token_ids": [[5, 6], [7]], "labels": [1, 0]},
    ]
    fast = window_documents_stacked(docs, cfg)
    ref = _reference_stack(docs, cfg)
    for k in ref:
        np.testing.assert_array_equal(ref[k], fast[k], err_msg=k)
    assert (fast["example_id"] == 1).all()
