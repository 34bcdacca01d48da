"""Gradient checkpointing (EncoderConfig.remat): backward-pass
rematerialization must not change gradients, only memory/FLOPs.

Reference has no equivalent (torch models keep all activations); this is
the standard TPU HBM-vs-FLOPs trade for 4096-token Longformer/BigBird
training (SURVEY §7 hard part: long-context training memory)."""

import numpy as np

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder


def _grads(cfg, params, ids, mask, rng):
    enc = Encoder(cfg)

    def loss_fn(p):
        out = enc.apply(
            {"params": p}, ids, attention_mask=mask, deterministic=False,
            rngs={"dropout": rng},
        )
        return jnp.sum(out.last_hidden_state.astype(jnp.float32) ** 2)

    return jax.grad(loss_fn)(params)


def test_remat_gradients_match():
    base = dict(
        vocab_size=128, hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.1, attention_dropout=0.1, add_pooler=False,
    )
    cfg = EncoderConfig(**base)
    cfg_r = EncoderConfig(**base, remat=True)
    rng = np.random.default_rng(0)
    B, L = 2, 32
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 24:] = 0
    mask = jnp.asarray(mask)

    params = Encoder(cfg).init(jax.random.PRNGKey(0), ids, attention_mask=mask)[
        "params"
    ]
    # remat wraps the layer classes but must leave the param tree identical
    params_r = Encoder(cfg_r).init(
        jax.random.PRNGKey(0), ids, attention_mask=mask
    )["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    drop = jax.random.PRNGKey(7)
    g = _grads(cfg, params, ids, mask, drop)
    g_r = _grads(cfg_r, params, ids, mask, drop)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_remat_sliding_window_trains():
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=128,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
        attention_type="sliding_window", attention_window=32, remat=True,
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, 127, size=(1, 64)), jnp.int32)
    gmask = jnp.zeros((1, 64), jnp.int32).at[:, 0].set(1)
    enc = Encoder(cfg)
    params = enc.init(
        jax.random.PRNGKey(0), ids, global_attention_mask=gmask
    )["params"]

    def loss_fn(p):
        out = enc.apply(
            {"params": p}, ids, global_attention_mask=gmask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean(out.last_hidden_state.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
