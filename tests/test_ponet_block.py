"""Fused PoNet mixer-block kernel vs the XLA mixer path (interpret on CPU).

The kernel's segmented top-2 scan must reproduce scatter-based segment max
with the second-max trick exactly (including max-ties and singleton
segments), plus GA/LMP/out-proj/LN through the same param tree.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.ponet import PoNetEncoder
from spokennlp_tpu.ops.pallas.ponet_block import _segmented_top2, _top2_combine

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
    ponet_mixer_impl="xla",
)


def _segments(L, rng):
    """Contiguous 1-based segment runs with random lengths."""
    ids = []
    s = 1
    while len(ids) < L:
        ids.extend([s] * int(rng.integers(1, 7)))
        s += 1
    return np.asarray(ids[:L], np.int32)


def test_segmented_top2_matches_numpy():
    rng = np.random.default_rng(0)
    L, D = 40, 4
    seg = _segments(L, rng)
    x = rng.normal(size=(L, D)).astype(np.float32)
    x[7] = x[5]  # engineered tie inside a run (if same segment)
    seg2 = seg[:, None]
    starts = jnp.asarray(seg2 != np.concatenate([[[-1]], seg2[:-1]]))
    ends = jnp.asarray(seg2 != np.concatenate([seg2[1:], [[-1]]]))
    f1, f2 = _segmented_top2(jnp.asarray(x), starts, reverse=False)
    b1, b2 = _segmented_top2(jnp.asarray(x), ends, reverse=True)
    m1, m2 = _top2_combine(f1, f2, b1, b2)
    m1, m2 = np.asarray(m1), np.asarray(m2)
    for s in np.unique(seg):
        rows = x[seg == s]
        want_m1 = rows.max(axis=0)
        for d in range(D):
            np.testing.assert_allclose(m1[seg == s, d], want_m1[d])
            less = rows[:, d][rows[:, d] < want_m1[d]]
            want_m2 = less.max() if len(less) else -1e9
            np.testing.assert_allclose(m2[seg == s, d], want_m2)


@pytest.mark.parametrize("quantize", ["none", "w8a8"])
def test_fused_ponet_encoder_matches_xla(quantize):
    rng = np.random.default_rng(1)
    B, L = 2, 64
    ids = jnp.asarray(rng.integers(3, 127, size=(B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 48:] = 0  # suffix padding
    segs = np.stack([_segments(L, rng), _segments(L, rng)])
    segs = np.where(mask > 0, segs, 0)
    maskj, segsj = jnp.asarray(mask), jnp.asarray(segs)

    cfg_x = dataclasses.replace(CFG, quantize=quantize)
    cfg_f = dataclasses.replace(CFG, quantize=quantize, ponet_mixer_impl="fused")
    enc_x = PoNetEncoder(cfg_x)
    params = enc_x.init(jax.random.PRNGKey(0), ids, attention_mask=maskj,
                        segment_ids=segsj)["params"]
    out_x = enc_x.apply({"params": params}, ids, attention_mask=maskj,
                        segment_ids=segsj)
    out_f = PoNetEncoder(cfg_f).apply({"params": params}, ids,
                                      attention_mask=maskj, segment_ids=segsj)
    valid = mask.astype(bool)
    a = np.asarray(out_x.last_hidden_state, np.float32)[valid]
    b = np.asarray(out_f.last_hidden_state, np.float32)[valid]
    if quantize == "none":
        np.testing.assert_allclose(b, a, atol=2e-2, rtol=1e-2)
    else:
        # both quantize, on different tensor partitions; require closeness
        assert np.isfinite(b).all()
        assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05
