"""PoNet mixer unit tests: pooling semantics, shapes, gradients, O(N) behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.ponet import (
    PoNetEncoder,
    PoNetForTokenClassification,
    local_max_pool,
    smp_second_max,
)

CFG = EncoderConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    hidden_dropout=0.0,
    add_pooler=False,
    ponet_local_window=3,
)


def test_smp_second_max_semantics():
    x = jnp.asarray(
        [
            [1.0, 5.0],
            [3.0, 2.0],
            [2.0, 4.0],  # segment 1: maxes are (3, 5)
            [9.0, 0.0],  # segment 2 singleton
        ]
    )
    seg = jnp.asarray([1, 1, 1, 2], jnp.int32)
    out = np.asarray(smp_second_max(x, seg, num_segments=4))
    # token 0: ch0 not max -> 3; ch1 IS max -> second max 4
    np.testing.assert_allclose(out[0], [3.0, 4.0])
    # token 1: ch0 IS max -> second 2; ch1 not max -> 5
    np.testing.assert_allclose(out[1], [2.0, 5.0])
    # token 2: ch0 not max -> 3; ch1 not max -> 5
    np.testing.assert_allclose(out[2], [3.0, 5.0])
    # singleton segment: second max falls back to max
    np.testing.assert_allclose(out[3], [9.0, 0.0])


def test_smp_pooling_bf16_exact():
    """The pooling chain runs in the compute dtype on TPU: max/compare only
    SELECT input values, so bf16 results must equal the f32 path bit-for-bit
    on bf16-representable inputs."""
    rng = np.random.default_rng(7)
    x16 = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    seg = jnp.asarray(rng.integers(0, 4, size=(24,)).astype(np.int32))
    got16 = smp_second_max(x16, seg, 4)
    got32 = smp_second_max(x16.astype(jnp.float32), seg, 4)
    np.testing.assert_array_equal(
        np.asarray(got16, np.float32), np.asarray(got32, np.float32)
    )
    mask = jnp.ones((1, 24), jnp.int32)
    lp16 = local_max_pool(x16[None], 3, mask)
    lp32 = local_max_pool(x16[None].astype(jnp.float32), 3, mask)
    np.testing.assert_array_equal(
        np.asarray(lp16, np.float32), np.asarray(lp32, np.float32)
    )


def test_ponet_w8a8_close_to_float():
    """quantize="w8a8" (QuantDense + fused MLP block, CPU integer twin) must
    track the float path closely through the same param tree."""
    rng = np.random.default_rng(9)
    B, L = 2, 32
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    segs = jnp.asarray((np.arange(L) // 8 + 1)[None].repeat(B, 0).astype(np.int32))
    enc_f = PoNetEncoder(CFG)
    params = enc_f.init(jax.random.PRNGKey(0), ids, attention_mask=mask,
                        segment_ids=segs)["params"]
    out_f = enc_f.apply({"params": params}, ids, attention_mask=mask,
                        segment_ids=segs)
    import dataclasses
    cfg_q = dataclasses.replace(CFG, quantize="w8a8")
    out_q = PoNetEncoder(cfg_q).apply({"params": params}, ids,
                                      attention_mask=mask, segment_ids=segs)
    a = np.asarray(out_f.last_hidden_state, np.float32).ravel()
    b = np.asarray(out_q.last_hidden_state, np.float32).ravel()
    assert np.isfinite(b).all()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05


def test_local_max_pool_window3():
    x = jnp.asarray([[[1.0], [5.0], [2.0], [4.0]]])  # (1, 4, 1)
    mask = jnp.ones((1, 4), jnp.int32)
    out = np.asarray(local_max_pool(x, 3, mask))[0, :, 0]
    np.testing.assert_allclose(out, [5.0, 5.0, 5.0, 4.0])


def test_local_max_pool_respects_mask():
    x = jnp.asarray([[[1.0], [2.0], [100.0]]])
    mask = jnp.asarray([[1, 1, 0]], jnp.int32)  # last token is padding
    out = np.asarray(local_max_pool(x, 3, mask))[0, :, 0]
    np.testing.assert_allclose(out[:2], [2.0, 2.0])


def test_ponet_forward_and_grads():
    model = PoNetForTokenClassification(CFG, num_labels=2)
    B, L = 2, 16
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    seg = jnp.asarray(np.repeat(np.arange(1, 5), 4)[None, :].repeat(B, 0), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, segment_ids=seg)["params"]
    out = model.apply({"params": params}, ids, mask, segment_ids=seg)
    assert out["token_logits"].shape == (B, L, 2)

    def loss(p):
        o = model.apply({"params": p}, ids, mask, segment_ids=seg)
        return (o["token_logits"] ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_segment_isolation():
    """Tokens in different segments don't exchange info through SMP."""
    model = PoNetEncoder(CFG)
    B, L = 1, 8
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    seg_a = jnp.asarray([[1, 1, 1, 1, 2, 2, 2, 2]], jnp.int32)
    seg_b = jnp.asarray([[1, 1, 1, 1, 3, 3, 3, 3]], jnp.int32)  # relabel only
    params = model.init(jax.random.PRNGKey(0), ids, mask, segment_ids=seg_a)["params"]
    out_a = model.apply({"params": params}, ids, mask, segment_ids=seg_a)
    out_b = model.apply({"params": params}, ids, mask, segment_ids=seg_b)
    # segment label VALUES don't matter, only the grouping
    np.testing.assert_allclose(
        np.asarray(out_a.last_hidden_state),
        np.asarray(out_b.last_hidden_state),
        atol=1e-5,
    )
