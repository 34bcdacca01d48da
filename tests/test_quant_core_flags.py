"""Parity of the measured-record quantization flags (default-off):

- ``core_int8`` on the fused attention block ("qk" / "av" / "both")
- ``static_h_scale`` on the fused MLP half-layer

Both were measured NEUTRAL-or-loss on the chip (BENCH_CEILING.md) and stay
in the kernels as the measured record; these tests keep their numerics
honest in interpret mode.
"""

import numpy as np

import jax.numpy as jnp

from spokennlp_tpu.ops.pallas.attention_block import fused_attention_block
from spokennlp_tpu.ops.pallas.mlp_block import (
    fused_mlp_block,
    reference_mlp_block,
)


def _attn_inputs(rng, B=2, L=64, H=32, nh=4, hd=8):
    hidden = jnp.asarray(rng.normal(0, 0.5, (B, L, H)), jnp.float32)
    seg = np.ones((B, L), np.int32)
    seg[0, 50:] = 0
    seg[1, 32:] = 2
    seg = jnp.asarray(seg)
    qkv_k = jnp.asarray(rng.normal(0, 0.05, (H, 3, nh, hd)), jnp.float32)
    qkv_b = jnp.asarray(rng.normal(0, 0.01, (3, nh, hd)), jnp.float32)
    out_k = jnp.asarray(rng.normal(0, 0.05, (nh, hd, H)), jnp.float32)
    out_b = jnp.asarray(rng.normal(0, 0.01, (H,)), jnp.float32)
    lns = jnp.asarray(rng.normal(1, 0.02, (H,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.float32)
    return hidden, seg, (qkv_k, qkv_b, out_k, out_b), (lns, lnb), hd


def test_core_int8_modes_match_bf16_core():
    rng = np.random.default_rng(0)
    hidden, seg, p, (lns, lnb), hd = _attn_inputs(rng)

    def run(mode):
        return np.asarray(
            fused_attention_block(
                hidden, seg, *p, sm_scale=hd**-0.5, quantized=True,
                ln_scale=lns, ln_bias=lnb, core_int8=mode, interpret=True,
                heads_per_block=4,
            )
        )

    base = run(False)
    valid = np.asarray(seg) > 0
    scale = np.abs(base[valid]).mean()
    for mode in ("qk", "av", "both"):
        got = run(mode)
        d = np.abs(got - base)[valid]
        # int8 core vs bf16 core: small quantization noise only
        assert d.mean() < 0.02 * max(scale, 1.0), (mode, d.mean(), scale)
        assert d.max() < 0.2 * max(scale, 1.0), (mode, d.max(), scale)


def test_core_int8_ignored_when_unquantized():
    rng = np.random.default_rng(1)
    hidden, seg, p, _, hd = _attn_inputs(rng)
    a = np.asarray(
        fused_attention_block(hidden, seg, *p, sm_scale=hd**-0.5,
                              quantized=False, core_int8="both",
                              interpret=True, heads_per_block=4)
    )
    b = np.asarray(
        fused_attention_block(hidden, seg, *p, sm_scale=hd**-0.5,
                              quantized=False, core_int8=False,
                              interpret=True, heads_per_block=4)
    )
    np.testing.assert_array_equal(a, b)


def test_static_h_scale_matches_oracle():
    rng = np.random.default_rng(2)
    M, H, I = 256, 32, 64
    x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (H, I)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.02, (I,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (I, H)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.float32)
    lns = jnp.asarray(rng.normal(1, 0.02, (H,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(0, 0.02, (H,)), jnp.float32)

    want = np.asarray(reference_mlp_block(x, w1, b1, w2, b2, lns, lnb))
    rowq = np.asarray(
        fused_mlp_block(x, w1, b1, w2, b2, lns, lnb, quantized=True,
                        interpret=True)
    )
    stat = np.asarray(
        fused_mlp_block(x, w1, b1, w2, b2, lns, lnb, quantized=True,
                        static_h_scale=True, interpret=True)
    )
    # static scale should be in the same accuracy class as per-row quant
    d_row = np.abs(rowq - want).mean()
    d_stat = np.abs(stat - want).mean()
    assert d_stat < max(2.5 * d_row, 0.02), (d_stat, d_row)
    np.testing.assert_allclose(stat, want, atol=0.15, rtol=0.1)
