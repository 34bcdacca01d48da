"""Chunked sliding-window attention == bias-path semantics, and full-encoder
equivalence between the two Longformer implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder, NEG_INF
from spokennlp_tpu.ops.sliding_attention import (
    chunked_sliding_window_attention,
    sliding_window_attention_mask_bias,
)


def _dense_oracle(q, k, v, attention_mask, global_mask, window):
    bias = sliding_window_attention_mask_bias(
        attention_mask, window, global_mask, neg_inf=NEG_INF
    )
    scale = 1.0 / q.shape[-1] ** 0.5
    scores = jnp.einsum("blhd,bmhd->bhlm", q * scale, k) + bias[:, None]
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v)


@pytest.mark.parametrize("with_global", [False, True])
def test_chunked_matches_dense_oracle(with_global):
    B, L, nh, hd = 2, 64, 2, 8
    window = 16  # one-sided 8; L % 8 == 0
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    am = np.ones((B, L), np.int32)
    am[1, 50:] = 0
    am = jnp.asarray(am)
    gm = None
    if with_global:
        g = np.zeros((B, L), np.int32)
        g[:, 0] = 1
        gm = jnp.asarray(g)

    got = np.asarray(
        chunked_sliding_window_attention(q, k, v, am, gm, window, max_globals=4)
    )
    want = np.asarray(_dense_oracle(q, k, v, am, gm, window))
    # compare NON-GLOBAL valid rows (global rows are the caller's global pass)
    valid = np.asarray(am).astype(bool)
    if gm is not None:
        valid &= ~np.asarray(gm).astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=1e-5)


def test_encoder_chunked_equals_bias_impl():
    base = dict(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=128,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
        attention_type="sliding_window", attention_window=16,
        max_global_tokens=4,
    )
    cfg_bias = EncoderConfig(**base, sliding_window_impl="bias")
    cfg_chunk = EncoderConfig(**base, sliding_window_impl="chunked")

    B, L = 2, 64
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    am = np.ones((B, L), np.int32)
    am[0, 56:] = 0
    am = jnp.asarray(am)
    gm = jnp.asarray(np.eye(1, L, dtype=np.int32).repeat(B, 0))  # CLS global

    enc_b = Encoder(cfg_bias)
    params = enc_b.init(
        jax.random.PRNGKey(0), ids, attention_mask=am, global_attention_mask=gm
    )["params"]
    out_b = enc_b.apply(
        {"params": params}, ids, attention_mask=am, global_attention_mask=gm
    )
    enc_c = Encoder(cfg_chunk)
    out_c = enc_c.apply(
        {"params": params}, ids, attention_mask=am, global_attention_mask=gm
    )
    valid = np.asarray(am).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_c.last_hidden_state)[valid],
        np.asarray(out_b.last_hidden_state)[valid],
        atol=2e-4,
    )


def test_longformer_4096_memory_feasible():
    """The chunked path compiles and runs at L=4096 (bias path would need a
    multi-GB score tensor)."""
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=4096,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
        attention_type="sliding_window", attention_window=512,
        sliding_window_impl="chunked", max_global_tokens=1,
    )
    enc = Encoder(cfg)
    B, L = 1, 4096
    ids = jnp.ones((B, L), jnp.int32)
    am = jnp.ones((B, L), jnp.int32)
    gm = jnp.zeros((B, L), jnp.int32).at[:, 0].set(1)
    params = enc.init(jax.random.PRNGKey(0), ids, attention_mask=am,
                      global_attention_mask=gm)["params"]
    out = enc.apply({"params": params}, ids, attention_mask=am,
                    global_attention_mask=gm)
    assert out.last_hidden_state.shape == (B, L, 32)
    assert np.all(np.isfinite(np.asarray(out.last_hidden_state)))
