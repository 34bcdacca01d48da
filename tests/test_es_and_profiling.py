"""Extractive-summarization pipeline + profiling hook tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, WindowingConfig
from spokennlp_tpu.projects.mug import extractive_summarization as ES
from spokennlp_tpu.train.profiling import StepTimer, annotate, device_memory_stats

WCFG = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0, bos_token_id=1)
EOS = 3


def _meeting():
    return {
        "meeting_key": "M1",
        "sentences": [{"id": i + 1, "s": f"第{i}句会议内容讨论"} for i in range(8)],
        "topic_segment_ids": [
            {"id": 4, "candidate": [{"key_sentence": [2, 3]}, {"key_sentence": [2]}]},
            {"id": 8, "candidate": [{"key_sentence": [6]}]},
        ],
        "paragraph_segment_ids": [{"id": i} for i in (2, 4, 6, 8)],
        "candidate": [{"key_sentence": [2, 6]}],
    }


def _tokenize(s):
    return [10 + (ord(c) % 100) for c in s]


def test_featurize_es_topic_level():
    examples, windows = ES.featurize_es_examples(
        [_meeting()], _tokenize, WCFG, EOS, level="topic"
    )
    assert len(examples) == 2  # two topics
    # key labels map to class 0
    assert examples[0]["key_labels"] == [0, 1, 1, 0]
    assert windows


def test_predict_and_rouge_end_to_end():
    from spokennlp_tpu.models.ponet import PoNetForTokenClassification

    enc = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=WCFG.max_seq_length,
        hidden_dropout=0.0, add_pooler=False,
    )
    model = PoNetForTokenClassification(enc, num_labels=2)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        segment_ids=jnp.ones((1, WCFG.max_seq_length), jnp.int32),
    )["params"]
    examples, windows = ES.featurize_es_examples(
        [_meeting()], _tokenize, WCFG, EOS, level="doc"
    )
    preds = ES.predict_key_sentences(model, params, examples, windows, batch_size=2,
                                     top_ratio=0.3)
    assert len(preds) == 1
    assert all(1 <= i <= 8 for i in preds[0])
    res = ES.evaluate_es_rouge(examples, preds)
    assert "multi-ref-average_rouge-1_f" in res

    # perfect prediction scores 1.0
    # parsed examples keep raw key labels (1 = key sentence)
    gold = [[i for i, k in enumerate(examples[0]["key_labels"], start=1) if k == 1]]
    res_gold = ES.evaluate_es_rouge(examples, gold)
    assert res_gold["multi-ref-max_rouge-l_f"] == pytest.approx(1.0)


def test_step_timer():
    t = StepTimer(warmup=0, window=10)
    for _ in range(5):
        t.tick()
    stats = t.stats()
    assert "steps_per_sec" in stats and stats["steps_per_sec"] > 0


def test_annotate_and_memory_stats():
    with annotate("test_region"):
        _ = jnp.ones(4).sum()
    stats = device_memory_stats()
    assert isinstance(stats, dict)
