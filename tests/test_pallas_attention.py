"""Pallas SNLD attention kernel: interpret-mode correctness + encoder wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.pallas.blhd_attention import (
    reference_snld_attention,
    snld_self_attention,
)


def test_kernel_matches_reference_interpret():
    B, nh, L, hd = 2, 4, 128, 16
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, 3, nh, L, hd)).astype(np.float32))
    seg = jnp.ones((B, L), jnp.int32)
    seg = seg.at[0, 100:].set(0)  # padding
    seg = seg.at[1, 64:].set(2)  # two packed windows

    got = np.asarray(
        snld_self_attention(qkv, seg, sm_scale=0.25, heads_per_block=2, interpret=True)
    )
    want = np.asarray(reference_snld_attention(qkv, seg, 0.25))
    valid0 = slice(0, 100)
    # kernel computes exp in bf16 (VPU-lean softmax): ~0.4% relative error
    np.testing.assert_allclose(got[0][:, valid0], want[0][:, valid0], atol=5e-3)
    np.testing.assert_allclose(got[1], want[1], atol=5e-3)


def test_packing_isolation():
    """Tokens in different packed windows must not attend to each other."""
    B, nh, L, hd = 1, 2, 64, 8
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(B, 3, nh, L, hd)).astype(np.float32))
    seg_packed = jnp.asarray(
        np.concatenate([np.ones(32), np.full(32, 2)])[None].astype(np.int32)
    )
    out_packed = np.asarray(
        snld_self_attention(qkv, seg_packed, 0.25, heads_per_block=1, interpret=True)
    )
    # window 1 alone should produce identical outputs for its tokens
    qkv_w1 = qkv[:, :, :, :32, :]
    out_w1 = np.asarray(
        snld_self_attention(
            qkv_w1, jnp.ones((1, 32), jnp.int32), 0.25, heads_per_block=1, interpret=True
        )
    )
    np.testing.assert_allclose(out_packed[:, :, :32], out_w1, atol=1e-7)


def test_encoder_pallas_impl_matches_einsum():
    cfg_einsum = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
        attention_impl="einsum",
    )
    cfg_pallas = EncoderConfig(**{**cfg_einsum.__dict__, "attention_impl": "pallas"})
    rng = np.random.default_rng(2)
    B, L = 2, 32
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 24:] = 0
    mask = jnp.asarray(mask)

    enc_e = Encoder(cfg_einsum)
    params = enc_e.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    out_e = enc_e.apply({"params": params}, ids, attention_mask=mask)

    enc_p = Encoder(cfg_pallas)
    out_p = enc_p.apply({"params": params}, ids, attention_mask=mask)  # same params!

    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_p.last_hidden_state)[valid],
        np.asarray(out_e.last_hidden_state)[valid],
        atol=2e-2,  # bf16-exp softmax in the kernel vs f32 in einsum
    )
