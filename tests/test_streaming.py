"""Streamed engine == batch engine: same metrics, same per-doc predictions.

The streamed pipeline (eval/streaming.py) must produce exactly what
run_topic_seg_inference produces (same model, same corpus, same bf16 fetch),
chunking and buffer-draining included; plus the raw-text mode (tokenize_fn
inside the stream) must match pre-tokenized input.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, WindowingConfig
from spokennlp_tpu.eval.inference import run_topic_seg_inference
from spokennlp_tpu.eval.streaming import stream_topic_seg_inference
from spokennlp_tpu.models.topic_seg import TopicSegModel


@pytest.fixture(scope="module")
def setup():
    enc = EncoderConfig(vocab_size=512, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64, add_pooler=False)
    wcfg = WindowingConfig(max_seq_length=64, cls_token_id=2, pad_token_id=0,
                           bos_token_id=1)
    model = TopicSegModel(enc, TopicSegConfig())
    params = model.init(
        jax.random.PRNGKey(0),
        jax.numpy.ones((2, 64), jax.numpy.int32),
        attention_mask=jax.numpy.ones((2, 64), jax.numpy.int32),
        deterministic=True,
    )["params"]
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(37):
        n = int(rng.integers(2, 30))
        docs.append({
            "sent_token_ids": [rng.integers(10, 500,
                                            size=rng.integers(2, 9)).tolist()
                               for _ in range(n)],
            "labels": rng.integers(0, 2, size=n).tolist(),
        })
    return model, params, wcfg, docs


def test_stream_matches_batch_engine(setup):
    model, params, wcfg, docs = setup
    ref = run_topic_seg_inference(model, params, docs, wcfg, batch_size=8,
                                  threshold=0.5)
    out = stream_topic_seg_inference(model, params, docs, wcfg, batch_size=8,
                                     chunk_batches=2, sent_k=32,
                                     threshold=0.5, docs_per_group=5)
    for key in ("f1", "precision", "recall",
                "threshold_0.5_example_level_pk",
                "threshold_0.5_example_level_wd"):
        assert out["metrics"][key] == ref["metrics"][key], key
    assert len(out["per_doc"]) == len(ref["per_doc"])
    for a, b in zip(out["per_doc"], ref["per_doc"]):
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=0)
    assert out["timing"]["windows"] >= len(docs)


def test_stream_raw_text_mode(setup):
    model, params, wcfg, docs = setup
    # fake tokenizer: word -> int hash; raw docs carry sentences as strings
    def tokenize_fn(sents):
        return [[(hash(w) % 490) + 10 for w in s.split()] for s in sents]

    raw_docs = [
        {"sentences": [" ".join(f"w{t}" for t in s)
                       for s in d["sent_token_ids"]],
         "labels": d["labels"]}
        for d in docs
    ]
    pretok = [{"sent_token_ids": tokenize_fn(d["sentences"]),
               "labels": d["labels"]} for d in raw_docs]
    a = stream_topic_seg_inference(model, params, pretok, wcfg, batch_size=8,
                                   sent_k=32, threshold=0.5)
    b = stream_topic_seg_inference(model, params, raw_docs, wcfg,
                                   batch_size=8, sent_k=32, threshold=0.5,
                                   tokenize_fn=tokenize_fn)
    assert a["metrics"] == b["metrics"]


def test_stream_sent_k_guard(setup):
    model, params, wcfg, docs = setup
    with pytest.raises(ValueError, match="sent_k"):
        stream_topic_seg_inference(model, params, docs, wcfg, batch_size=8,
                                   sent_k=2, threshold=0.5)
