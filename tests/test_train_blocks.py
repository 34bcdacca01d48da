"""Custom-VJP training kernels (ops/pallas/train_blocks.py) vs XLA oracles.

CPU interpret-mode: dropout must be OFF (the in-kernel hardware PRNG has no
CPU lowering); rate>0 behavior is covered by the chip-gated tests in
test_tpu_kernel_parity.py. Gradient parity here is checked against autodiff
of the einsum semantics the kernels replace (the einsum training path of
models/encoder.py; reference trains through stock torch modules,
emnlp2023-topic_segmentation/src/models/bert_for_ts.py:55-82).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.pallas.attention_block import reference_attention_block
from spokennlp_tpu.ops.pallas.train_blocks import (
    attention_block_train,
    mlp_block_train,
)


def test_attention_train_grads_match_oracle():
    B, L, H, nh = 2, 128, 64, 4
    hd = H // nh
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    # batch 0 has a padded suffix; batch 1 is full
    seg = jnp.asarray(
        np.where(np.arange(L)[None] < np.array([[100], [L]]), 1, 0).astype(np.int32)
    )
    qkv_k = jnp.asarray(rng.normal(size=(H, 3, nh, hd)).astype(np.float32) * 0.3)
    qkv_b = jnp.asarray(rng.normal(size=(3, nh, hd)).astype(np.float32) * 0.1)
    out_k = jnp.asarray(rng.normal(size=(nh, hd, H)).astype(np.float32) * 0.3)
    out_b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    seed = jnp.zeros((1,), jnp.int32)
    s = 1.0 / hd**0.5
    # cotangent zeroed at padded positions: the kernel uses an additive -1e9
    # bias (like the einsum path) while the oracle uses a hard `where`; the
    # two differ only in fully-padded ROWS, whose upstream cotangent is
    # always zero in a real model (losses mask padding)
    cot = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    cot = cot * (seg > 0)[:, :, None]

    def f_kernel(x, qkv_k, qkv_b, out_k, out_b):
        o = attention_block_train(
            x, seg, qkv_k, qkv_b, out_k, out_b, seed, s,
            dropout_rate=0.0, interpret=True,
        )
        return jnp.sum(o * cot), o

    def f_oracle(x, qkv_k, qkv_b, out_k, out_b):
        o = reference_attention_block(x, seg, qkv_k, qkv_b, out_k, out_b, s)
        return jnp.sum(o * cot), o

    args = (x, qkv_k, qkv_b, out_k, out_b)
    (_, ok), gk = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(*args)
    (_, oo), go = jax.value_and_grad(f_oracle, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(*args)
    valid = (seg > 0)[:, :, None]
    np.testing.assert_allclose(
        np.where(valid, ok, 0), np.where(valid, oo, 0), atol=2e-4
    )
    for name, a, b in zip(("dx", "dwqkv", "dbqkv", "dwo", "dbo"), gk, go):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-3, (name, err)


def test_mlp_train_grads_match_oracle():
    M, H, I = 96, 64, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(H, I)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(I,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(I, H)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))

    def f_kernel(x, w1, b1, w2, b2):
        # block_m=32 exercises the padded multi-block grid (M=96 -> 3 blocks)
        o = mlp_block_train(x, w1, b1, w2, b2, activation="gelu", block_m=32,
                            interpret=True)
        return jnp.sum(o * cot), o

    def f_oracle(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=True)  # the kernel's act
        o = h @ w2 + b2
        return jnp.sum(o * cot), o

    args = (x, w1, b1, w2, b2)
    (_, ok), gk = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(*args)
    (_, oo), go = jax.value_and_grad(f_oracle, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(*args)
    np.testing.assert_allclose(ok, oo, atol=1e-4)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gk, go):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-4, (name, err)


def test_mlp_train_nondivisible_m_pads():
    M, H, I = 40, 32, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(H, I)).astype(np.float32) * 0.2)
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(I, H)).astype(np.float32) * 0.2)
    b2 = jnp.zeros((H,), jnp.float32)
    o = mlp_block_train(x, w1, b1, w2, b2, block_m=16, interpret=True)
    h = jax.nn.gelu(x @ w1 + b1, approximate=True)
    np.testing.assert_allclose(o, h @ w2 + b2, atol=1e-4)
    g = jax.grad(
        lambda x: jnp.sum(
            mlp_block_train(x, w1, b1, w2, b2, block_m=16, interpret=True) ** 2
        )
    )(x)
    go = jax.grad(
        lambda x: jnp.sum(
            (jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2) ** 2
        )
    )(x)
    np.testing.assert_allclose(g, go, atol=1e-3)


@pytest.mark.slow
def test_encoder_train_fused_matches_einsum():
    """Whole-trunk grad parity: attention_impl='train_fused' vs 'einsum'
    (dropout 0 so the paths are deterministic; the only numeric delta is the
    kernels' tanh-gelu vs the einsum path's exact-erf gelu)."""
    B, L = 2, 64

    def make(impl):
        cfg = EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=L, add_pooler=False,
            attention_impl=impl, hidden_dropout=0.0, attention_dropout=0.0,
        )
        return Encoder(cfg)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 90, size=(B, L)).astype(np.int32))
    mask = jnp.asarray(
        (np.arange(L)[None] < np.array([[50], [L]])).astype(np.int32)
    )
    m1, m2 = make("einsum"), make("train_fused")
    params = m1.init(
        jax.random.PRNGKey(0), ids, attention_mask=mask, deterministic=True
    )["params"]
    cot = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    cot = cot * mask[:, :, None]

    def loss(m):
        def f(p):
            out = m.apply(
                {"params": p}, ids, attention_mask=mask, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out.last_hidden_state * cot)
        return f

    l1, g1 = jax.value_and_grad(loss(m1))(params)
    l2, g2 = jax.value_and_grad(loss(m2))(params)
    assert abs(float(l1) - float(l2)) < 0.05 * (abs(float(l1)) + 1.0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g2)
    }
    for k, v in flat1:
        other = flat2[jax.tree_util.keystr(k)]
        scale = float(jnp.max(jnp.abs(v))) + 1e-6
        err = float(jnp.max(jnp.abs(v - other))) / scale
        assert err < 5e-3, (jax.tree_util.keystr(k), err)
