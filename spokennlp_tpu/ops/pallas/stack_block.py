"""Whole-encoder-stack megakernel: all N transformer layers in ONE Pallas
kernel; the hidden state never leaves VMEM between layers.

Why (profiled at BERT-base, B=128, L=512 on v5e): the two-kernel-per-layer
pipeline (ops/pallas/attention_block.py + mlp_block.py) round-trips the
(B, L, H) hidden through HBM four times per layer (~400 MB/layer, ~4.8 GB
per forward) and pays 24 kernel launches. Here the grid is
(batch, num_layers) with layers innermost:

  step (b, l): hidden for sequence b lives in a VMEM scratch buffer;
    layer l's weights arrive as layer-indexed blocks (Pallas revolving
    buffers prefetch layer l+1's weights during layer l's compute);
    attention block + MLP block both run in-register;
    at l == N-1 the scratch is flushed to the output block.

HBM per forward: read x once + write out once (~200 MB) + weights
(N_layers * ~7 MB int8, re-fetched per sequence but fully overlapped with
~34 us of compute per step vs ~9 us of DMA). The layer math is identical to
the two fused kernels it replaces (post-LN BERT, W8A8 projections with
in-register row quantization, bf16 softmax exp, f32 LayerNorm).

The reference has no custom kernels at all (HF torch encoders; reference:
emnlp2023-topic_segmentation/src/models/bert_for_ts.py:55-67).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from spokennlp_tpu.ops.pallas.int8_matmul import (
    _ACTIVATIONS,
    rowquant_in_kernel as _rowquant,
)

Array = jax.Array

NEG_INF = -1e9


def _stack_kernel(
    # inputs
    seg_ref,  # (1, 1, L)
    x_ref,  # (1, L, H) compute dtype
    wqkv_ref,  # (1, 3, H, nh*hd) int8 | compute
    swqkv_ref,  # (1, 3, 1, nh*hd) f32
    bqkv_ref,  # (1, 3, 1, nh*hd) f32
    wo_ref,  # (1, nh*hd, H) int8 | compute
    swo_ref,  # (1, 1, H) f32
    bo_ref,  # (1, 1, H) f32
    ln1s_ref,  # (1, 1, H) f32
    ln1b_ref,  # (1, 1, H) f32
    w1_ref,  # (1, H, I) int8 | compute
    sw1_ref,  # (1, 1, I) f32
    b1_ref,  # (1, 1, I) f32
    w2_ref,  # (1, I, H) int8 | compute
    sw2_ref,  # (1, 1, H) f32
    b2_ref,  # (1, 1, H) f32
    ln2s_ref,  # (1, 1, H) f32
    ln2b_ref,  # (1, 1, H) f32
    # output
    o_ref,  # (1, L, H) compute dtype
    # scratch
    h_scr,  # (L, H) compute dtype — the resident hidden state
    *,
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    quantized: bool,
    activation: str,
    eps: float,
):
    from jax.experimental import pallas as pl

    l = pl.program_id(1)
    n_layers = pl.num_programs(1)
    nh, hd = num_heads, head_dim

    @pl.when(l == 0)
    def _():
        h_scr[:] = x_ref[0]

    x = h_scr[:]  # (L, H) compute dtype
    xf = x.astype(jnp.float32)

    seg = seg_ref[0, 0]  # (L,)
    allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)  # (L, L)

    # ---- attention half-layer: h1 = LN(x + outproj(MHA(qkv(x)))) ----
    if quantized:
        x8, sx = _rowquant(xf, pl)

        def proj(s):
            return (
                jnp.dot(x8, wqkv_ref[0, s], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * swqkv_ref[0, s]
                + bqkv_ref[0, s]
            )

        q = (proj(0) * sm_scale).astype(x.dtype)
        k = proj(1).astype(x.dtype)
        v = proj(2).astype(x.dtype)
    else:
        q = (
            (
                jnp.dot(x, wqkv_ref[0, 0], preferred_element_type=jnp.float32)
                + bqkv_ref[0, 0]
            )
            * sm_scale
        ).astype(x.dtype)
        k = (
            jnp.dot(x, wqkv_ref[0, 1], preferred_element_type=jnp.float32)
            + bqkv_ref[0, 1]
        ).astype(x.dtype)
        v = (
            jnp.dot(x, wqkv_ref[0, 2], preferred_element_type=jnp.float32)
            + bqkv_ref[0, 2]
        ).astype(x.dtype)

    ctx_parts = []
    for h in range(nh):
        col = slice(h * hd, (h + 1) * hd)
        scores = (
            jax.lax.dot_general(
                q[:, col], k[:, col], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp((scores - m).astype(x.dtype))  # bf16 exp: 2x VPU rate
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        ctxh = jax.lax.dot_general(
            p.astype(x.dtype), v[:, col], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ctx_parts.append((ctxh / denom).astype(x.dtype))
    ctx = jnp.concatenate(ctx_parts, axis=1)  # (L, nh*hd)

    if quantized:
        c8, sc = _rowquant(ctx.astype(jnp.float32), pl)
        attn = (
            jnp.dot(c8, wo_ref[0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sc
            * swo_ref[0]
        )
    else:
        attn = jnp.dot(ctx, wo_ref[0], preferred_element_type=jnp.float32)
    r1 = attn + bo_ref[0] + xf
    mean1 = jnp.mean(r1, axis=1, keepdims=True)
    c1 = r1 - mean1
    var1 = jnp.mean(c1 * c1, axis=1, keepdims=True)
    h1 = (
        c1 * jax.lax.rsqrt(var1 + eps) * ln1s_ref[0] + ln1b_ref[0]
    ).astype(x.dtype)

    # ---- MLP half-layer: h2 = LN(h1 + W2 . act(W1 . h1 + b1) + b2) ----
    h1f = h1.astype(jnp.float32)
    if quantized:
        h18, s1 = _rowquant(h1f, pl)
        mid = (
            jnp.dot(h18, w1_ref[0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * s1
            * sw1_ref[0]
            + b1_ref[0]
        )
    else:
        mid = (
            jnp.dot(h1, w1_ref[0], preferred_element_type=jnp.float32)
            + b1_ref[0]
        )
    mid = _ACTIVATIONS[activation](mid)
    if quantized:
        m8, sm = _rowquant(mid, pl)
        y = (
            jnp.dot(m8, w2_ref[0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sm
            * sw2_ref[0]
            + b2_ref[0]
        )
    else:
        y = (
            jnp.dot(mid.astype(x.dtype), w2_ref[0], preferred_element_type=jnp.float32)
            + b2_ref[0]
        )
    r2 = y + h1f
    mean2 = jnp.mean(r2, axis=1, keepdims=True)
    c2 = r2 - mean2
    var2 = jnp.mean(c2 * c2, axis=1, keepdims=True)
    h2 = (
        c2 * jax.lax.rsqrt(var2 + eps) * ln2s_ref[0] + ln2b_ref[0]
    ).astype(x.dtype)

    h_scr[:] = h2

    @pl.when(l == n_layers - 1)
    def _():
        o_ref[0] = h2


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "quantized",
        "activation",
        "eps",
        "interpret",
        "vmem_limit_mb",
    ),
)
def fused_encoder_stack(
    hidden: Array,  # (B, L, H) compute dtype
    segment_ids: Array,  # (B, L) int32; 0 = padding, >0 = window/segment id
    qkv_kernels: Array,  # (NL, H, 3, nh, hd) f32 params, stacked over layers
    qkv_biases: Array,  # (NL, 3, nh, hd)
    out_kernels: Array,  # (NL, nh, hd, H)
    out_biases: Array,  # (NL, H)
    ln1_scales: Array,  # (NL, H)
    ln1_biases: Array,  # (NL, H)
    mlp_w1: Array,  # (NL, H, I)
    mlp_b1: Array,  # (NL, I)
    mlp_w2: Array,  # (NL, I, H)
    mlp_b2: Array,  # (NL, H)
    ln2_scales: Array,  # (NL, H)
    ln2_biases: Array,  # (NL, H)
    sm_scale: float,
    quantized: bool = True,
    activation: str = "gelu",
    eps: float = 1e-12,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
) -> Array:
    """Run the full post-LN transformer stack; returns (B, L, H).

    Weight preparation (layout + int8 per-output-channel quantization) is
    plain vectorized XLA over the stacked layer axis — inside a jitted
    inference loop over batches it is loop-invariant and hoisted, so its
    cost is paid once per weight set, not per batch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = hidden.shape
    NL, _, three, nh, hd = qkv_kernels.shape
    assert three == 3
    I = mlp_w1.shape[2]
    dt = hidden.dtype

    # (NL, 3, H, nh*hd): per-layer fused-QKV weight as one MXU-friendly slab
    wqkv = qkv_kernels.transpose(0, 2, 1, 3, 4).reshape(NL, 3, H, nh * hd)
    bqkv = qkv_biases.reshape(NL, 3, 1, nh * hd).astype(jnp.float32)
    wo = out_kernels.reshape(NL, nh * hd, H)
    bo = out_biases.reshape(NL, 1, H).astype(jnp.float32)

    if quantized:
        wf = wqkv.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=2, keepdims=True), 1e-6)
        swqkv = amax / 127.0  # (NL, 3, 1, nh*hd)
        wqkv = jnp.clip(jnp.round(wf / swqkv), -127, 127).astype(jnp.int8)
        wof = wo.astype(jnp.float32)
        oamax = jnp.maximum(jnp.max(jnp.abs(wof), axis=1, keepdims=True), 1e-6)
        swo = oamax / 127.0  # (NL, 1, H)
        wo = jnp.clip(jnp.round(wof / swo), -127, 127).astype(jnp.int8)
        w1f = mlp_w1.astype(jnp.float32)
        a1 = jnp.maximum(jnp.max(jnp.abs(w1f), axis=1, keepdims=True), 1e-6)
        sw1 = a1 / 127.0  # (NL, 1, I)
        w1 = jnp.clip(jnp.round(w1f / sw1), -127, 127).astype(jnp.int8)
        w2f = mlp_w2.astype(jnp.float32)
        a2 = jnp.maximum(jnp.max(jnp.abs(w2f), axis=1, keepdims=True), 1e-6)
        sw2 = a2 / 127.0  # (NL, 1, H)
        w2 = jnp.clip(jnp.round(w2f / sw2), -127, 127).astype(jnp.int8)
    else:
        wqkv = wqkv.astype(dt)
        wo = wo.astype(dt)
        w1 = mlp_w1.astype(dt)
        w2 = mlp_w2.astype(dt)
        swqkv = jnp.ones((NL, 3, 1, nh * hd), jnp.float32)
        swo = jnp.ones((NL, 1, H), jnp.float32)
        sw1 = jnp.ones((NL, 1, I), jnp.float32)
        sw2 = jnp.ones((NL, 1, H), jnp.float32)

    b1 = mlp_b1.reshape(NL, 1, I).astype(jnp.float32)
    b2 = mlp_b2.reshape(NL, 1, H).astype(jnp.float32)
    ln1s = ln1_scales.reshape(NL, 1, H).astype(jnp.float32)
    ln1b = ln1_biases.reshape(NL, 1, H).astype(jnp.float32)
    ln2s = ln2_scales.reshape(NL, 1, H).astype(jnp.float32)
    ln2b = ln2_biases.reshape(NL, 1, H).astype(jnp.float32)

    kernel = functools.partial(
        _stack_kernel,
        num_heads=nh,
        head_dim=hd,
        sm_scale=float(sm_scale),
        quantized=quantized,
        activation=activation,
        eps=float(eps),
    )

    flops = (
        B * NL * (2 * 3 * L * H * nh * hd + nh * 4 * L * L * hd
                  + 2 * L * nh * hd * H + 4 * L * H * I)
    )

    layer_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b, l: (l,) + (0,) * len(shape)
    )
    batch_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b, l: (b,) + (0,) * len(shape)
    )

    return pl.pallas_call(
        kernel,
        grid=(B, NL),  # layers innermost: weights stream, hidden stays in VMEM
        in_specs=[
            batch_spec((1, L)),  # seg (middle singleton: Mosaic tiling rule)
            batch_spec((L, H)),  # x
            layer_spec((3, H, nh * hd)),  # wqkv
            layer_spec((3, 1, nh * hd)),  # swqkv
            layer_spec((3, 1, nh * hd)),  # bqkv
            layer_spec((nh * hd, H)),  # wo
            layer_spec((1, H)),  # swo
            layer_spec((1, H)),  # bo
            layer_spec((1, H)),  # ln1s
            layer_spec((1, H)),  # ln1b
            layer_spec((H, I)),  # w1
            layer_spec((1, I)),  # sw1
            layer_spec((1, I)),  # b1
            layer_spec((I, H)),  # w2
            layer_spec((1, H)),  # sw2
            layer_spec((1, H)),  # b2
            layer_spec((1, H)),  # ln2s
            layer_spec((1, H)),  # ln2b
        ],
        out_specs=batch_spec((L, H)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
        scratch_shapes=[pltpu.VMEM((L, H), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * L * H * 4 + B * NL * (2 * H * I + 3 * H * nh * hd),
            transcendentals=B * NL * nh * L * L,
        ),
        interpret=interpret,
    )(
        segment_ids.astype(jnp.int32)[:, None, :],
        hidden,
        wqkv,
        swqkv,
        bqkv,
        wo,
        swo,
        bo,
        ln1s,
        ln1b,
        w1,
        sw1,
        b1,
        w2,
        sw2,
        b2,
        ln2s,
        ln2b,
    )
