"""Fused sliding-window (Longformer) attention-block kernel vs XLA oracles.

Oracle chain: the einsum + mask-bias sliding path (exact dense formulation)
and the chunked O(L*window) path are both compared against the one-kernel
Pallas path (interpret mode on CPU) through the SAME param tree — the fused
path must consume an unmodified checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder


def _cfg(**over):
    base = dict(
        vocab_size=128,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        add_pooler=False,
        attention_type="sliding_window",
        attention_window=16,
        attention_impl="einsum",
        sliding_window_impl="bias",
    )
    base.update(over)
    return EncoderConfig(**base)


def _inputs(B=2, L=64):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 48:] = 0  # suffix padding (kernel contract)
    gmask = np.zeros((B, L), np.int32)
    gmask[:, 0] = 1  # CLS global (prefix contract)
    return ids, jnp.asarray(mask), jnp.asarray(gmask)


@pytest.mark.parametrize("quantize", ["none", "w8a8"])
def test_fused_sliding_encoder_matches_bias_oracle(quantize):
    ids, mask, gmask = _inputs()
    cfg_o = _cfg(quantize=quantize)
    cfg_f = _cfg(
        attention_impl="fused", sliding_window_impl="fused", quantize=quantize
    )

    enc_o = Encoder(cfg_o)
    params = enc_o.init(
        jax.random.PRNGKey(0), ids, attention_mask=mask,
        global_attention_mask=gmask,
    )["params"]
    out_o = enc_o.apply(
        {"params": params}, ids, attention_mask=mask, global_attention_mask=gmask
    )
    out_f = Encoder(cfg_f).apply(
        {"params": params},
        ids,
        attention_mask=mask,
        global_attention_mask=gmask,
        prefix_globals=1,
    )
    valid = np.asarray(mask).astype(bool)
    got = np.asarray(out_f.last_hidden_state)[valid]
    want = np.asarray(out_o.last_hidden_state)[valid]
    if quantize == "none":
        np.testing.assert_allclose(got, want, atol=2e-2)
    else:
        # both paths quantize, but rowquant happens on different tensors;
        # require close agreement, not bitwise
        np.testing.assert_allclose(got, want, atol=2e-1)
        assert np.abs(got - want).mean() < 2e-2


def test_fused_sliding_matches_chunked_path():
    ids, mask, gmask = _inputs()
    cfg_c = _cfg(sliding_window_impl="chunked")
    cfg_f = _cfg(attention_impl="fused", sliding_window_impl="fused")
    enc_c = Encoder(cfg_c)
    params = enc_c.init(
        jax.random.PRNGKey(1), ids, attention_mask=mask,
        global_attention_mask=gmask,
    )["params"]
    out_c = enc_c.apply(
        {"params": params}, ids, attention_mask=mask, global_attention_mask=gmask
    )
    out_f = Encoder(cfg_f).apply(
        {"params": params},
        ids,
        attention_mask=mask,
        global_attention_mask=gmask,
        prefix_globals=1,
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_f.last_hidden_state)[valid],
        np.asarray(out_c.last_hidden_state)[valid],
        atol=2e-2,
    )


def test_fused_sliding_no_globals_fast_path():
    """prefix_globals=0 (MMVTS text-encoder parity: HF Longformer with no
    global tokens) statically skips the global-row stage; results must match
    the einsum path given the same all-zeros global mask."""
    ids, mask, _ = _inputs()
    zeros = jnp.zeros_like(mask)
    cfg_o = _cfg()
    cfg_f = _cfg(attention_impl="fused", sliding_window_impl="fused")
    enc_o = Encoder(cfg_o)
    params = enc_o.init(
        jax.random.PRNGKey(3), ids, attention_mask=mask,
        global_attention_mask=zeros,
    )["params"]
    out_o = enc_o.apply(
        {"params": params}, ids, attention_mask=mask, global_attention_mask=zeros
    )
    out_f = Encoder(cfg_f).apply(
        {"params": params},
        ids,
        attention_mask=mask,
        global_attention_mask=zeros,
        prefix_globals=0,
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_f.last_hidden_state)[valid],
        np.asarray(out_o.last_hidden_state)[valid],
        atol=2e-2,
    )


def test_fused_sliding_requires_prefix_contract():
    """Without the prefix_globals promise the encoder must NOT pick the
    kernel (falls back to chunked/bias) — results stay correct for any mask."""
    ids, mask, gmask = _inputs()
    cfg_f = _cfg(attention_impl="fused", sliding_window_impl="auto")
    enc = Encoder(cfg_f)
    params = enc.init(
        jax.random.PRNGKey(2), ids, attention_mask=mask,
        global_attention_mask=gmask,
    )["params"]
    # no prefix_globals -> oracle path; with it -> kernel path; same numbers
    out_no = enc.apply(
        {"params": params}, ids, attention_mask=mask, global_attention_mask=gmask
    )
    out_yes = enc.apply(
        {"params": params},
        ids,
        attention_mask=mask,
        global_attention_mask=gmask,
        prefix_globals=1,
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_yes.last_hidden_state)[valid],
        np.asarray(out_no.last_hidden_state)[valid],
        atol=2e-2,
    )
