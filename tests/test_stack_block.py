"""Whole-stack megakernel (ops/pallas/stack_block.py): oracle equivalence,
quantized equivalence vs the per-layer fused kernels, and encoder
integration with an identical param tree."""

import numpy as np

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.pallas.attention_block import fused_attention_block
from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block
from spokennlp_tpu.ops.pallas.stack_block import fused_encoder_stack

NL, H, nh, hd, I = 3, 32, 4, 8, 64


def _params(rng):
    p = {}
    p["qkv_k"] = jnp.asarray(rng.normal(0, 0.05, (NL, H, 3, nh, hd)), jnp.float32)
    p["qkv_b"] = jnp.asarray(rng.normal(0, 0.01, (NL, 3, nh, hd)), jnp.float32)
    p["out_k"] = jnp.asarray(rng.normal(0, 0.05, (NL, nh, hd, H)), jnp.float32)
    p["out_b"] = jnp.asarray(rng.normal(0, 0.01, (NL, H)), jnp.float32)
    p["ln1s"] = jnp.asarray(rng.normal(1, 0.02, (NL, H)), jnp.float32)
    p["ln1b"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    p["w1"] = jnp.asarray(rng.normal(0, 0.05, (NL, H, I)), jnp.float32)
    p["b1"] = jnp.asarray(rng.normal(0, 0.01, (NL, I)), jnp.float32)
    p["w2"] = jnp.asarray(rng.normal(0, 0.05, (NL, I, H)), jnp.float32)
    p["b2"] = jnp.asarray(rng.normal(0, 0.01, (NL, H)), jnp.float32)
    p["ln2s"] = jnp.asarray(rng.normal(1, 0.02, (NL, H)), jnp.float32)
    p["ln2b"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    return p


def _run_stack(hidden, seg, p, quantized):
    return fused_encoder_stack(
        hidden, seg, p["qkv_k"], p["qkv_b"], p["out_k"], p["out_b"],
        p["ln1s"], p["ln1b"], p["w1"], p["b1"], p["w2"], p["b2"],
        p["ln2s"], p["ln2b"], sm_scale=hd ** -0.5, quantized=quantized,
        interpret=True,
    )


def _run_layers(hidden, seg, p, quantized):
    h = hidden
    for l in range(NL):
        h = fused_attention_block(
            h, seg, p["qkv_k"][l], p["qkv_b"][l], p["out_k"][l], p["out_b"][l],
            sm_scale=hd ** -0.5, quantized=quantized, ln_scale=p["ln1s"][l],
            ln_bias=p["ln1b"][l], interpret=True, heads_per_block=nh,
        )
        B, L, _ = h.shape
        h = fused_mlp_block(
            h.reshape(B * L, H), p["w1"][l], p["b1"][l], p["w2"][l], p["b2"][l],
            p["ln2s"][l], p["ln2b"][l], quantized=quantized, interpret=True,
        ).reshape(B, L, H)
    return h


def _seg(B, L):
    seg = np.ones((B, L), np.int32)
    seg[:, L - 8:] = 0             # padding tail
    if B > 1:
        seg[1, : L // 2] = 1
        seg[1, L // 2: L - 8] = 2  # packed windows
    return jnp.asarray(seg)


def test_stack_matches_per_layer_kernels_float():
    rng = np.random.default_rng(0)
    B, L = 2, 64
    p = _params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.float32)
    seg = _seg(B, L)
    a = np.asarray(_run_stack(hidden, seg, p, quantized=False))
    b = np.asarray(_run_layers(hidden, seg, p, quantized=False))
    valid = np.asarray(seg) > 0
    np.testing.assert_allclose(a[valid], b[valid], atol=5e-3, rtol=1e-2)


def test_stack_matches_per_layer_kernels_quantized():
    # identical int8 arithmetic; only f32 epilogue reduce-order differs
    # (measured bit-for-bit equal in bf16 on the v5e chip)
    rng = np.random.default_rng(1)
    B, L = 2, 64
    p = _params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.float32)
    seg = _seg(B, L)
    a = np.asarray(_run_stack(hidden, seg, p, quantized=True))
    b = np.asarray(_run_layers(hidden, seg, p, quantized=True))
    valid = np.asarray(seg) > 0
    np.testing.assert_allclose(a[valid], b[valid], atol=1e-4, rtol=1e-3)


def test_encoder_stack_impl_matches_einsum():
    cfg_e = EncoderConfig(
        vocab_size=128, hidden_size=H, num_layers=2, num_heads=nh,
        intermediate_size=I, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=True,
        attention_impl="einsum",
    )
    cfg_s = EncoderConfig(**{**cfg_e.__dict__, "attention_impl": "stack"})
    rng = np.random.default_rng(2)
    B, L = 2, 32
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 24:] = 0
    mask = jnp.asarray(mask)

    enc_e = Encoder(cfg_e)
    params = enc_e.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    out_e = enc_e.apply({"params": params}, ids, attention_mask=mask)
    # identical param tree: the stack path consumes the same checkpoint
    out_s = Encoder(cfg_s).apply({"params": params}, ids, attention_mask=mask)

    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_s.last_hidden_state)[valid],
        np.asarray(out_e.last_hidden_state)[valid],
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.pooled_output), np.asarray(out_e.pooled_output),
        atol=2e-2,
    )


def test_encoder_stack_falls_back_when_hiddens_requested():
    cfg = EncoderConfig(
        vocab_size=64, hidden_size=H, num_layers=2, num_heads=nh,
        intermediate_size=I, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
        attention_impl="stack",
    )
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 63, size=(1, 16)), jnp.int32)
    enc = Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), ids)["params"]
    out = enc.apply({"params": params}, ids, output_hidden_states=True)
    assert out.hidden_states is not None and len(out.hidden_states) == 3
