"""Fused BigBird attention-block kernel vs the XLA oracles (CPU interpret).

Same-params comparison through the encoder: the (L, L)-bias einsum path and
the block-gather path are both exact twins of the BigBird pattern; the fused
kernel must match them on suffix-padded inputs.
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
        max_position_embeddings=128,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        add_pooler=False,
        attention_type="bigbird",
        bigbird_block_size=8,
        bigbird_num_global_blocks=2,
        bigbird_num_random_blocks=3,
        bigbird_seed=7,
        attention_impl="einsum",
        bigbird_impl="bias",
    )
    base.update(over)
    return EncoderConfig(**base)


def _inputs(B=2, L=128):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 100:] = 0  # suffix padding
    return ids, jnp.asarray(mask)


@pytest.mark.parametrize("quantize", ["none", "w8a8"])
def test_fused_bigbird_matches_bias_oracle(quantize):
    ids, mask = _inputs()
    cfg_o = _cfg(quantize=quantize)
    cfg_f = _cfg(
        attention_impl="fused", bigbird_impl="fused", quantize=quantize
    )
    enc_o = Encoder(cfg_o)
    params = enc_o.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    out_o = enc_o.apply({"params": params}, ids, attention_mask=mask)
    out_f = Encoder(cfg_f).apply(
        {"params": params}, ids, attention_mask=mask, prefix_globals=0
    )
    valid = np.asarray(mask).astype(bool)
    got = np.asarray(out_f.last_hidden_state)[valid]
    want = np.asarray(out_o.last_hidden_state)[valid]
    if quantize == "none":
        np.testing.assert_allclose(got, want, atol=2e-2)
    else:
        assert np.isfinite(got).all()
        assert np.abs(got - want).mean() < 0.05 * np.abs(want).mean() + 0.05


def test_fused_bigbird_matches_block_path():
    ids, mask = _inputs()
    cfg_b = _cfg(bigbird_impl="block")
    cfg_f = _cfg(attention_impl="fused", bigbird_impl="fused")
    enc_b = Encoder(cfg_b)
    params = enc_b.init(jax.random.PRNGKey(1), ids, attention_mask=mask)["params"]
    out_b = enc_b.apply({"params": params}, ids, attention_mask=mask)
    out_f = Encoder(cfg_f).apply(
        {"params": params}, ids, attention_mask=mask, prefix_globals=0
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_f.last_hidden_state)[valid],
        np.asarray(out_b.last_hidden_state)[valid],
        atol=2e-2,
    )


def test_fused_bigbird_needs_suffix_promise():
    """Without prefix_globals the auto path must NOT pick the kernel."""
    ids, mask = _inputs()
    cfg = _cfg(attention_impl="fused", bigbird_impl="auto")
    enc = Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(2), ids, attention_mask=mask)["params"]
    out_no = enc.apply({"params": params}, ids, attention_mask=mask)
    out_yes = enc.apply(
        {"params": params}, ids, attention_mask=mask, prefix_globals=0
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_yes.last_hidden_state)[valid],
        np.asarray(out_no.last_hidden_state)[valid],
        atol=2e-2,
    )
