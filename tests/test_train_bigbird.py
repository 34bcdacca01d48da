"""Custom-VJP BigBird training kernel (ops/pallas/train_bigbird.py) vs the
XLA block-sparse oracle.

CPU interpret-mode: dropout must be OFF (the in-kernel hardware PRNG has no
CPU lowering); rate>0 behavior is covered by the chip-gated tests in
test_tpu_kernel_parity.py. The oracle is the exact XLA formulation the
kernel replaces: bigbird_block_sparse_attention (reference semantics:
emnlp2023-topic_segmentation/src/models/bigbird_for_ts.py — HF BigBird ITC
with clamped window edges and first-occurrence dedup of random blocks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.bigbird_attention import bigbird_block_sparse_attention
from spokennlp_tpu.ops.pallas.train_bigbird import bigbird_attention_block_train

B, L, H, nh = 2, 64, 32, 2
hd = H // nh
BSZ = 8  # block size (nb = 8)
G, R = 2, 2
PATTERN_SEED = 0
SCALE = 1.0 / hd**0.5


def _inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    # batch 0: padded suffix (48 valid); batch 1: full
    mask = jnp.asarray(
        (np.arange(L)[None] < np.array([[48], [L]])).astype(np.int32)
    )
    qkv_k = jnp.asarray(rng.normal(size=(H, 3, nh, hd)).astype(np.float32) * 0.3)
    qkv_b = jnp.asarray(rng.normal(size=(3, nh, hd)).astype(np.float32) * 0.1)
    out_k = jnp.asarray(rng.normal(size=(nh, hd, H)).astype(np.float32) * 0.3)
    out_b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    cot = cot * (mask > 0)[:, :, None]
    return x, mask, qkv_k, qkv_b, out_k, out_b, cot


def _oracle(x, mask, qkv_k, qkv_b, out_k, out_b):
    """XLA reference: projections + block-sparse attention + out proj
    (exactly the einsum training path's semantics)."""
    q = jnp.einsum("blh,hsnd->blsnd", x, qkv_k) + qkv_b
    q, k, v = q[:, :, 0], q[:, :, 1], q[:, :, 2]
    ctx = bigbird_block_sparse_attention(
        q, k, v, mask, BSZ, G, R, PATTERN_SEED
    )
    return jnp.einsum("blnd,ndh->blh", ctx, out_k) + out_b


def test_bigbird_train_grads_match_block_sparse_oracle():
    x, mask, qkv_k, qkv_b, out_k, out_b, cot = _inputs()
    seed = jnp.zeros((1,), jnp.int32)

    def f_kernel(x, qkv_k, qkv_b, out_k, out_b):
        o = bigbird_attention_block_train(
            x, mask, qkv_k, qkv_b, out_k, out_b, seed, SCALE,
            block_size=BSZ, num_global_blocks=G, num_random_blocks=R,
            pattern_seed=PATTERN_SEED, dropout_rate=0.0, interpret=True,
        )
        return jnp.sum(o * cot), o

    def f_oracle(x, qkv_k, qkv_b, out_k, out_b):
        o = _oracle(x, mask, qkv_k, qkv_b, out_k, out_b)
        return jnp.sum(o * cot), o

    argnums = tuple(range(5))
    args = (x, qkv_k, qkv_b, out_k, out_b)
    (_, ok), gk = jax.value_and_grad(f_kernel, argnums=argnums, has_aux=True)(*args)
    (_, oo), go = jax.value_and_grad(f_oracle, argnums=argnums, has_aux=True)(*args)

    np.testing.assert_allclose(
        np.asarray(ok) * np.asarray(cot != 0),
        np.asarray(oo) * np.asarray(cot != 0),
        atol=2e-4,
    )
    names = ("x", "qkv_k", "qkv_b", "out_k", "out_b")
    for name, a, b in zip(names, gk, go):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 5e-3, (name, err)


def test_bigbird_train_no_random_blocks():
    """R=0 (nb=1 fallback analogue): window + global only."""
    x, mask, qkv_k, qkv_b, out_k, out_b, cot = _inputs()
    seed = jnp.zeros((1,), jnp.int32)

    o = bigbird_attention_block_train(
        x, mask, qkv_k, qkv_b, out_k, out_b, seed, SCALE,
        block_size=BSZ, num_global_blocks=G, num_random_blocks=0,
        pattern_seed=PATTERN_SEED, dropout_rate=0.0, interpret=True,
    )
    q = jnp.einsum("blh,hsnd->blsnd", x, qkv_k) + qkv_b
    q, k, v = q[:, :, 0], q[:, :, 1], q[:, :, 2]
    ctx = bigbird_block_sparse_attention(q, k, v, mask, BSZ, G, 0,
                                         PATTERN_SEED)
    ref = jnp.einsum("blnd,ndh->blh", ctx, out_k) + out_b
    live = np.asarray(mask > 0)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(o) * live, np.asarray(ref) * live, atol=2e-4
    )


@pytest.mark.slow
def test_encoder_train_fused_bigbird_matches_block():
    """Whole-trunk grad parity: bigbird trunk, attention_impl 'train_fused'
    (fused kernel) vs 'einsum' with the bias path — dropout 0, suffix
    padding (the featurizer contract)."""
    Bt, Lt = 2, 64

    def make(impl):
        cfg = EncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=Lt + 8,
            add_pooler=False, attention_type="bigbird",
            bigbird_block_size=BSZ, bigbird_num_global_blocks=G,
            bigbird_num_random_blocks=R, bigbird_seed=PATTERN_SEED,
            bigbird_impl="bias",
            attention_impl=impl, hidden_dropout=0.0, attention_dropout=0.0,
            pad_token_id=0,
        )
        return Encoder(cfg)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 90, size=(Bt, Lt)).astype(np.int32))
    mask = jnp.asarray(
        (np.arange(Lt)[None] < np.array([[48], [Lt]])).astype(np.int32)
    )
    m1, m2 = make("einsum"), make("train_fused")
    params = m1.init(
        jax.random.PRNGKey(0), ids, attention_mask=mask,
        deterministic=True, prefix_globals=0,
    )["params"]
    cot = jnp.asarray(rng.normal(size=(Bt, Lt, 32)).astype(np.float32))
    cot = cot * mask[:, :, None]

    def loss(m):
        def f(p):
            out = m.apply(
                {"params": p}, ids, attention_mask=mask,
                deterministic=False, prefix_globals=0,
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
