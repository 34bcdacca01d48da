"""Tests for the MUG project layer: rouge, parsing, evaluators, PoNet track."""

import numpy as np
import pytest

from spokennlp_tpu.configs import EncoderConfig, WindowingConfig
from spokennlp_tpu.eval.rouge import multi_reference_rouge, rouge_scores
from spokennlp_tpu.projects.mug import data as D
from spokennlp_tpu.projects.mug import evaluate as E
from spokennlp_tpu.projects.mug.topic_segmentation import (
    predict_boundaries,
    window_document_eos,
)
from spokennlp_tpu.utils.tokenization import BasicTokenizer


# ------------------------------------------------------------------- rouge


def test_rouge_identical():
    s = rouge_scores(["a b c d"], ["a b c d"])
    assert s["rouge-1"]["f"] == pytest.approx(1.0)
    assert s["rouge-2"]["f"] == pytest.approx(1.0)
    assert s["rouge-l"]["f"] == pytest.approx(1.0)


def test_rouge_known_values():
    # hyp: {a,b,c}; ref: {a,b,d} -> overlap 2; p=r=2/3
    s = rouge_scores(["a b c"], ["a b d"])
    assert s["rouge-1"]["p"] == pytest.approx(2 / 3)
    assert s["rouge-1"]["r"] == pytest.approx(2 / 3)
    # bigrams: hyp {ab,bc}; ref {ab,bd} -> overlap 1
    assert s["rouge-2"]["p"] == pytest.approx(1 / 2)
    # LCS("abc","abd") = 2
    assert s["rouge-l"]["p"] == pytest.approx(2 / 3)


def test_multi_reference_rouge_avg_vs_max():
    preds = ["a b"]
    refs = [["a b", "c d"]]  # one perfect ref, one disjoint
    out = multi_reference_rouge(preds, refs)
    assert out["multi-ref-max_rouge-1_f"] == pytest.approx(1.0)
    assert out["multi-ref-average_rouge-1_f"] == pytest.approx(0.5)


# ---------------------------------------------------------------- tokenizer


def test_basic_tokenizer_cjk_and_punct():
    t = BasicTokenizer()
    assert t.tokenize("今天开会") == ["今", "天", "开", "会"]
    assert t.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert t.tokenize("Héllo") == ["hello"]


# ------------------------------------------------------------------ parsing


def _meeting(n=6, topic_ends=(2, 6), para_ends=(1, 2, 4, 6), actions=(3,)):
    return {
        "meeting_key": "M1",
        "sentences": [{"id": i + 1, "s": f"第{i}句话内容"} for i in range(n)],
        "topic_segment_ids": [
            {"id": e, "candidate": [{"key_sentence": [e], "title": f"题目{e}"}]}
            for e in topic_ends
        ],
        "paragraph_segment_ids": [{"id": e} for e in para_ends],
        "action_ids": [{"id": a} for a in actions],
        "candidate": [{"key_sentence": [1, 3], "key_word": ["会议", "纪要"]}],
    }


def test_parse_topic_segmentation_labels():
    parsed = D.parse_topic_segmentation(_meeting())
    # para ends 1,2,4,6 get live labels; topic ends 2,6 -> B-EOP(0)
    assert parsed["labels"] == [1, 0, -100, 1, -100, 0]


def test_parse_action_items():
    parsed = D.parse_action_items(_meeting())
    assert parsed["labels"] == [0, 0, 1, 0, 0, 0]


def test_parse_extractive_summarization_topic_level():
    out = D.parse_extractive_summarization(_meeting(), level="topic")
    assert len(out) == 2  # two topics
    # first topic spans sentences 1..2, key sentence id 2 -> local label idx 1
    assert out[0]["key_labels"] == [0, 1]


# --------------------------------------------------------------- evaluators


def test_topic_segment_evaluate_perfect():
    labels = [_meeting()]
    preds = D.topic_segmentation_submission(["M1"], [[2, 6]])
    res = E.topic_segment_evaluate(labels, preds)
    assert res["score"] == pytest.approx(1.0)
    assert res["test_pos_f1"] == pytest.approx(1.0)


def test_topic_segment_evaluate_wrong():
    labels = [_meeting()]
    preds = D.topic_segmentation_submission(["M1"], [[4]])  # wrong boundary
    res = E.topic_segment_evaluate(labels, preds)
    assert res["score"] < 1.0


def test_action_item_evaluate():
    labels = [_meeting()]
    res = E.action_item_detection_evaluate(
        labels, D.action_item_submission(["M1"], [[3]])
    )
    assert res["score"] == pytest.approx(1.0)
    res2 = E.action_item_detection_evaluate(
        labels, D.action_item_submission(["M1"], [[1]])
    )
    assert res2["score"] == 0.0


def test_keyphrase_evaluate():
    labels = [_meeting()]
    res = E.keyphrase_extraction_evaluate(
        labels, D.keyphrase_submission(["M1"], [["会议", "纪要"]])
    )
    assert res["score"] == pytest.approx(1.0)


def test_extractive_summarization_evaluate_perfect():
    labels = [_meeting()]
    preds = D.extractive_summarization_submission(
        ["M1"],
        [[{"id": 2, "key_sentence": [2]}, {"id": 6, "key_sentence": [6]}]],
        [[1, 3]],
    )
    res = E.extractive_summarization_evaluate(labels, preds)
    assert res["score"] == pytest.approx(1.0)


def test_title_generation_evaluate_perfect():
    labels = [_meeting()]
    preds = D.title_generation_submission(
        ["M1"], [[{"id": 2, "title": "题目2"}, {"id": 6, "title": "题目6"}]]
    )
    res = E.topic_title_generation_evaluate(labels, preds)
    assert res["score"] == pytest.approx(1.0)


# --------------------------------------------------- EOS windows + PoNet e2e


WCFG = WindowingConfig(max_seq_length=24, cls_token_id=2, pad_token_id=0, bos_token_id=1)
EOS = 3


def test_window_document_eos_invariants():
    rng = np.random.default_rng(0)
    sents = [rng.integers(10, 100, size=rng.integers(2, 6)).tolist() for _ in range(9)]
    labels = rng.integers(0, 2, size=9).tolist()
    windows = window_document_eos(sents, labels, WCFG, EOS)
    labeled = [sid for w in windows for sid in w.sent_ids]
    assert len(labeled) == len(set(labeled))
    assert 8 not in labeled  # final sentence never labeled
    for w in windows:
        assert w.input_ids[0] == WCFG.cls_token_id
        assert w.segment_ids[0] == 0
        live = w.labels != -100
        # labels sit at EOS positions
        assert all(w.input_ids[i] == EOS for i in np.where(live)[0])
        # pads get segment n_sent + 1
        pad = w.attention_mask == 0
        if pad.any():
            assert np.all(w.segment_ids[pad] == 10)


def test_ponet_predict_boundaries_e2e():
    import jax
    import jax.numpy as jnp
    from spokennlp_tpu.models.ponet import PoNetForTokenClassification

    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=WCFG.max_seq_length,
        hidden_dropout=0.0, add_pooler=False,
    )
    model = PoNetForTokenClassification(cfg, num_labels=2)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        segment_ids=jnp.ones((1, WCFG.max_seq_length), jnp.int32),
    )["params"]

    rng = np.random.default_rng(1)
    meetings = []
    for _ in range(2):
        n = int(rng.integers(5, 10))
        meetings.append(
            {
                "sentences": ["s" * int(rng.integers(2, 5)) for _ in range(n)],
                "labels": rng.integers(0, 2, size=n).tolist(),
            }
        )

    def tokenize(s):
        return [10 + (ord(c) % 100) for c in s]

    bounds = predict_boundaries(model, params, meetings, tokenize, WCFG, EOS, batch_size=4)
    assert len(bounds) == 2
    for b, m in zip(bounds, meetings):
        assert all(1 <= i <= len(m["sentences"]) for i in b)
