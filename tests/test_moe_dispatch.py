"""Capacity-dispatch MoE path (models/multimodal.py MoELayer moe_impl).

Parity with the dense-combine formulation at generous capacity, capacity
dropping semantics, and an expert-sharded (EP) run on the virtual mesh.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.models.multimodal import MoELayer, MultimodalConfig

BASE = MultimodalConfig(
    hidden_size=32,
    intermediate_size=64,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    moe_num_experts=8,
    moe_top_k=2,
    moe_residual=False,
)


def _run(cfg, x, mask, params=None):
    layer = MoELayer(cfg)
    if params is None:
        params = layer.init(jax.random.PRNGKey(0), x, mask)["params"]
    y, aux = layer.apply({"params": params}, x, mask)
    return np.asarray(y), float(aux), params


def test_dispatch_matches_dense_at_generous_capacity():
    """With capacity >= every assignment, dispatch == dense combine (same
    experts, same gates; E=8 top-2)."""
    rng = np.random.default_rng(0)
    B, L, H = 2, 24, 32
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = np.ones((B, L), np.int32)
    mask[1, 20:] = 0
    mask = jnp.asarray(mask)

    dense_cfg = dataclasses.replace(BASE, moe_impl="dense")
    y_dense, aux_dense, params = _run(dense_cfg, x, mask)
    disp_cfg = dataclasses.replace(
        BASE, moe_impl="dispatch", moe_capacity_factor=100.0
    )
    y_disp, aux_disp, _ = _run(disp_cfg, x, mask, params)
    valid = np.asarray(mask).astype(bool)
    # the dense path computes (well-defined) garbage at pad clips; dispatch
    # zeroes them — compare where it matters
    np.testing.assert_allclose(y_disp[valid], y_dense[valid], atol=1e-5, rtol=1e-4)
    assert aux_disp == pytest.approx(aux_dense, rel=1e-5)
    # pad clips contribute nothing in the dispatch path
    np.testing.assert_allclose(y_disp[1, 20:], 0.0, atol=1e-6)


def test_dispatch_capacity_drops_overflow_tokens():
    """At capacity_factor -> tiny, most assignments drop; surviving outputs
    must be a subset of the generous-capacity outputs (row-wise: either
    equal or zeroed/reduced), never garbage."""
    rng = np.random.default_rng(1)
    B, L, H = 1, 48, 32  # 48 choice-0s fit in 64 slots; +48 choice-1s overflow
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)

    big = dataclasses.replace(BASE, moe_impl="dispatch", moe_capacity_factor=100.0)
    y_big, _, params = _run(big, x, mask)
    tiny = dataclasses.replace(BASE, moe_impl="dispatch", moe_capacity_factor=0.01)
    y_tiny, _, _ = _run(tiny, x, mask, params)
    # capacity 8 slots/expert minimum: some tokens survive, later ones drop
    dropped = np.abs(y_tiny).sum(-1) == 0

    # independent numpy walk of the GShard k-major priority rule: tokens
    # whose BOTH choices survive must match the uncapped output exactly
    gl = (
        x.reshape(-1, H) @ np.asarray(params["gate"]["kernel"])
        + np.asarray(params["gate"]["bias"])
    )
    E, K, C = 8, 2, 8
    topi = np.argsort(-gl, axis=1)[:, :K]
    counters = np.zeros(E, np.int64)
    survives = np.zeros((L, K), bool)
    for k in range(K):  # choice 0 of every token outranks any choice 1
        for n in range(L):
            e = topi[n, k]
            if counters[e] < C:
                survives[n, k] = True
                counters[e] += 1
    assert not survives.all(), "capacity must drop some assignments"
    both = survives.all(axis=1)
    assert both.any(), "some token must keep both choices"

    np.testing.assert_allclose(
        y_tiny[0, both], y_big[0, both], atol=1e-5, rtol=1e-4
    )
    # tokens with zero surviving choices are exactly the zero rows
    none = ~survives.any(axis=1)
    np.testing.assert_array_equal(dropped[0], none)


def test_dispatch_expert_sharded_ep():
    """EP: shard the expert axis of w_in/w_out over the 8-device virtual
    mesh; the sharded apply must reproduce the single-device result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(2)
    B, L, H = 2, 16, 32
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    cfg = dataclasses.replace(BASE, moe_impl="dispatch", moe_capacity_factor=2.0)
    y_ref, aux_ref, params = _run(cfg, x, mask)

    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("model",))
    ep = {
        "gate": jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), params["gate"]
        ),
        "w_in": jax.device_put(
            params["w_in"], NamedSharding(mesh, P("model", None, None))
        ),
        "w_out": jax.device_put(
            params["w_out"], NamedSharding(mesh, P("model", None, None))
        ),
    }
    layer = MoELayer(cfg)

    @jax.jit
    def run(p, x, m):
        return layer.apply({"params": p}, x, m)

    with mesh:
        y, aux = run(ep, x, mask)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5, rtol=1e-4)
    assert float(aux) == pytest.approx(aux_ref, rel=1e-4)
