"""Tests for DA augmentation, TSSP labels, and paired featurization."""

import numpy as np

from spokennlp_tpu.configs import TopicSegConfig, WindowingConfig
from spokennlp_tpu.data import augmentation as aug
from spokennlp_tpu.data.featurization import batches_from_docs, featurize_paired
from spokennlp_tpu.data.windowing import IGNORE

CFG = WindowingConfig(max_seq_length=24, cls_token_id=101, pad_token_id=0, bos_token_id=1)


def _docs(rng, n_docs=3, max_sent=10):
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(4, max_sent))
        labels = rng.integers(0, 2, size=n).tolist()
        labels[-1] = 1  # typical corpora end with unlabeled/trailing sentence
        docs.append(
            {
                "sent_token_ids": [
                    rng.integers(10, 200, size=rng.integers(2, 5)).tolist()
                    for _ in range(n)
                ],
                "labels": labels,
            }
        )
    return docs


def test_topic_spans():
    assert aug._topic_spans([1, 0, 1, 1, 0, 1]) == [(0, 1), (2, 4)]
    assert aug._topic_spans([1, 1, 1]) == []  # no B-EOP -> no closed topic


def test_shuffle_preserves_topic_multiset():
    rng = np.random.default_rng(0)
    docs = [
        {
            "sent_token_ids": [[i] for i in range(8)],
            "labels": [1, 0, 1, 1, 0, 1, 1, 0],  # topics: [0,1], [2,3,4], [5,6,7]
        }
    ]
    sents, labels, pairs, replaced, orders = aug.shuffle_and_replace_topics(
        0, docs, rng
    )
    assert not replaced  # single doc: replacement impossible
    assert sorted(orders) == [0, 1, 2]
    # topics stay contiguous; each output topic matches an input topic
    spans = aug._topic_spans(labels)
    got_topics = [tuple(t[0] for t in sents[s : e + 1]) for s, e in spans]
    assert sorted(got_topics) == sorted([(0, 1), (2, 3, 4), (5, 6, 7)])
    # first sentence of each topic is labeled PAIR_NEW_TOPIC
    for s, e in spans:
        assert pairs[s] == aug.PAIR_NEW_TOPIC


def test_intra_topic_shuffle_keeps_final_sentence():
    rng = np.random.default_rng(1)
    sents = [[i] for i in range(6)]
    labels = [1, 1, 0, 1, 1, 0]  # topics [0..2], [3..5]
    for _ in range(10):
        s2, l2, p2 = aug.shuffle_intra_topic(sents, labels, rng)
        assert l2 == [1, 1, 0, 1, 1, 0]
        assert s2[2] == [2] and s2[5] == [5]  # topic-final sentences pinned
        assert p2[0] == aug.PAIR_NEW_TOPIC and p2[3] == aug.PAIR_NEW_TOPIC
        # in-topic members permuted
        assert sorted(x[0] for x in s2[0:3]) == [0, 1, 2]


def test_tssp_labels_identity_permutation():
    """With an unshuffled permutation, every non-first sentence is NSP."""

    class FixedRng:
        def shuffle(self, x):
            pass

        def random(self):
            return 0.0

    sents = [[i] for i in range(5)]
    labels = [1, 1, 0, 1, 0]
    s2, l2, p2 = aug.shuffle_intra_topic(sents, labels, FixedRng())
    assert p2 == [2, 0, 0, 2, 0]


def test_paired_featurization_alignment():
    rng = np.random.default_rng(2)
    docs = _docs(rng)
    pairs = featurize_paired(docs, CFG, rng)
    assert pairs
    for a, d in pairs:
        # same example, same token span
        assert a.example_id == d.example_id
        assert a.token_span == d.token_span
        # DA windows carry pair orders at sentence slots
        live = d.sent_mask == 1
        assert np.all(d.pair_orders[live] != IGNORE)
        # anchor windows have no pair orders
        assert np.all(a.pair_orders[a.sent_mask == 1] == IGNORE)
        # window tensor invariants
        for w in (a, d):
            assert w.input_ids[0] == CFG.cls_token_id
            assert w.input_ids.shape == (CFG.max_seq_length,)


def test_batches_have_cssl_indices():
    rng = np.random.default_rng(3)
    docs = _docs(rng, n_docs=4)
    task = TopicSegConfig(cl_anchor_level="eop_list")
    batches = list(
        batches_from_docs(docs, CFG, task, batch_size=2, rng=rng, drop_last=False)
    )
    assert batches
    b = batches[0]
    assert b["input_ids"].shape[1] == 2  # paired views
    assert "cssl_anchor_indices" in b
    A = b["cssl_anchor_valid"].sum()
    # anchors equal the number of valid eops in the anchor view when > gate
    n_eops = b["eop_mask"][:, 0].sum()
    assert A == 0 or A == n_eops
