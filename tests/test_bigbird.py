"""BigBird block-sparse attention: block path vs dense (L,L)-bias oracle,
trunk integration, and checkpoint-tree parity with the dense trunk.

Reference backbone: emnlp2023-topic_segmentation/src/models/bigbird_for_ts.py
(HF BigBird wrapper); here the pattern is a static gather-index table.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.bigbird_attention import (
    bigbird_attention_bias,
    bigbird_block_indices,
    bigbird_block_sparse_attention,
    reference_bigbird_attention,
)


def test_block_indices_structure():
    idx = bigbird_block_indices(16, num_global_blocks=2, num_random_blocks=3, seed=0)
    assert idx.shape == (16, 2 + 3 + 3)
    for i in range(16):
        row = set(idx[i].tolist())
        assert {0, 1} <= row                      # global blocks
        assert {max(i - 1, 0), i, min(i + 1, 15)} <= row  # window
    # deterministic for a fixed seed
    idx2 = bigbird_block_indices(16, 2, 3, seed=0)
    np.testing.assert_array_equal(idx, idx2)
    assert not np.array_equal(idx, bigbird_block_indices(16, 2, 3, seed=1))


@pytest.mark.parametrize("L", [512, 1024])
def test_block_sparse_matches_dense_oracle(L):
    rng = np.random.default_rng(0)
    B, nh, hd, bsz = 2, 2, 16, 64
    q = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, nh, hd)).astype(np.float32))
    mask = np.ones((B, L), np.int32)
    mask[1, L - 100:] = 0  # padding
    mask = jnp.asarray(mask)

    got = np.asarray(
        bigbird_block_sparse_attention(q, k, v, mask, bsz, 2, 3, seed=0)
    )
    want = np.asarray(
        reference_bigbird_attention(q, k, v, mask, bsz, 2, 3, seed=0)
    )
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-5)


def test_sparsity_actually_masks():
    """A key block outside window/global/random must not influence output."""
    rng = np.random.default_rng(1)
    B, L, nh, hd, bsz = 1, 512, 1, 8, 64
    nb = L // bsz
    idx = bigbird_block_indices(nb, 2, 1, seed=0)
    # find a block not attended by query block 4
    attended = set(idx[4].tolist()) | {0, 1}
    free = [b for b in range(2, nb) if b not in attended and b not in (3, 4, 5)]
    assert free, "pattern too dense for the test"
    tgt = free[0]
    q = rng.normal(size=(B, L, nh, hd)).astype(np.float32)
    k = rng.normal(size=(B, L, nh, hd)).astype(np.float32)
    v = rng.normal(size=(B, L, nh, hd)).astype(np.float32)
    mask = jnp.ones((B, L), jnp.int32)
    out1 = np.asarray(bigbird_block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask, bsz, 2, 1, seed=0))
    k2, v2 = k.copy(), v.copy()
    k2[:, tgt * bsz:(tgt + 1) * bsz] += 100.0
    v2[:, tgt * bsz:(tgt + 1) * bsz] += 100.0
    out2 = np.asarray(bigbird_block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), mask, bsz, 2, 1, seed=0))
    # query block 4's rows unchanged; global rows (block 0-1) see everything
    rows = slice(4 * bsz, 5 * bsz)
    np.testing.assert_allclose(out1[0, rows], out2[0, rows], atol=1e-6)
    assert np.abs(out1[0, :bsz] - out2[0, :bsz]).max() > 1.0


def _cfg(L, impl):
    return EncoderConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=L, add_pooler=False,
        hidden_dropout=0.0, attention_dropout=0.0,
        attention_type="bigbird", bigbird_block_size=64,
        bigbird_num_global_blocks=1, bigbird_num_random_blocks=2,
        bigbird_impl=impl,
    )


def test_encoder_bigbird_block_matches_bias_impl():
    L = 512
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(3, 199, size=(2, L)), jnp.int32)
    mask = np.ones((2, L), np.int32)
    mask[1, 400:] = 0
    mask = jnp.asarray(mask)
    enc_bias = Encoder(_cfg(L, "bias"))
    params = enc_bias.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    out_bias = enc_bias.apply({"params": params}, ids, attention_mask=mask)
    enc_blk = Encoder(_cfg(L, "block"))
    out_blk = enc_blk.apply({"params": params}, ids, attention_mask=mask)
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out_blk.last_hidden_state)[valid],
        np.asarray(out_bias.last_hidden_state)[valid],
        atol=2e-4,
    )


def test_bigbird_param_tree_matches_dense_trunk():
    """Same checkpoint loads on dense and bigbird trunks (HF BigBird weights
    convert through the same bert_to_encoder_params mapping)."""
    L = 128
    dense = dataclasses.replace(_cfg(L, "bias"), attention_type="dense")
    ids = jnp.ones((1, L), jnp.int32)
    p1 = Encoder(dense).init(jax.random.PRNGKey(0), ids)["params"]
    p2 = Encoder(_cfg(L, "bias")).init(jax.random.PRNGKey(0), ids)["params"]
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
