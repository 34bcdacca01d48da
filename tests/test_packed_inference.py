"""Packed inference: bin packing, logit equivalence with unpacked computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, WindowingConfig
from spokennlp_tpu.data.windowing import stack_windows, window_document
from spokennlp_tpu.eval.inference import make_predict_fn, predict_windows
from spokennlp_tpu.eval.packed_inference import (
    build_packed_batch,
    pack_windows,
    predict_windows_packed,
)
from spokennlp_tpu.models.topic_seg import TopicSegModel

ENC = EncoderConfig(
    vocab_size=256, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
)
WCFG = WindowingConfig(max_seq_length=64, cls_token_id=2, pad_token_id=0, bos_token_id=1)


def test_pack_windows_first_fit():
    bins = pack_windows([30, 40, 20, 10], max_seq_length=64)
    total = sum(len(b.window_indices) for b in bins)
    assert total == 4
    # 40+20 fit one bin, 30+10 another (first-fit-decreasing)
    assert len(bins) == 2
    for b in bins:
        assert sum(b.lengths) <= 64
        # offsets are consistent with lengths
        for (o1, l1), o2 in zip(zip(b.offsets, b.lengths), b.offsets[1:]):
            assert o2 == o1 + l1


def _windows(rng, n_docs=5):
    windows = []
    for eid in range(n_docs):
        n = int(rng.integers(3, 8))
        sents = [rng.integers(10, 250, size=rng.integers(2, 6)).tolist() for _ in range(n)]
        labels = rng.integers(0, 2, size=n).tolist()
        windows.extend(window_document(sents, labels, WCFG, example_id=eid))
    return windows


def test_packed_logits_match_unpacked():
    rng = np.random.default_rng(0)
    windows = _windows(rng)
    model = TopicSegModel(ENC, TopicSegConfig())
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        attention_mask=jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        deterministic=True,
    )["params"]

    packed = predict_windows_packed(model, params, windows, WCFG.max_seq_length, batch_size=4)

    batch = stack_windows(windows)
    fn = make_predict_fn(model, params)
    unpacked = predict_windows(fn, batch, batch_size=4)

    for i, w in enumerate(windows):
        n = int(w.attention_mask.sum())
        np.testing.assert_allclose(packed[i, :n], unpacked[i, :n], atol=2e-4)


def test_packing_reduces_sequences():
    rng = np.random.default_rng(1)
    windows = _windows(rng, n_docs=10)
    batch, plan = build_packed_batch(windows, WCFG.max_seq_length)
    assert batch["input_ids"].shape[0] < len(windows)  # actual compression
    fill = batch["attention_mask"].sum() / batch["attention_mask"].size
    assert fill > 0.5
