"""Training-path fused blocks with custom VJPs (flash-style recompute).

Why: the einsum training path lets autodiff save every (B, nh, L, L)
attention-probability tensor (plus its dropout output) as a residual — at
BERT-base B=16/L=512 that is ~100 MB of HBM per layer per view, ~2.4 GB per
dual-view step, all of it read back in the backward pass. These kernels save
ONLY the layer inputs and recompute attention inside the backward kernel, so
the (L, L) tensors never touch HBM in either direction; q/k/v and the (M, 4H)
MLP intermediate stay in VMEM too (same fusion win as the inference kernels in
attention_block.py / mlp_block.py, which have no VJP and skip dropout).

Attention-probability dropout runs IN-kernel on the hardware PRNG
(pltpu.prng_seed / prng_random_bits) — the host-PRNG (threefry) masks the
einsum path generates for the same tensors are themselves a measurable cost at
(B, nh, L, L) scale. Forward and backward reseed identically per (seed, batch
program), so the backward regenerates bit-identical masks instead of loading
saved ones.

The layer math matches the einsum training path (HF BERT semantics; reference
trains this through stock torch modules, e.g.
emnlp2023-topic_segmentation/src/models/bert_for_ts.py:55-82):

  attn(x) = (softmax(q k^T / sqrt(hd) + segbias) . dropout) v . Wo + bo
  mlp(x)  = act(x W1 + b1) W2 + b2

Residual + LayerNorm + hidden-state dropout stay in XLA (cheap (B, L, H)
elementwise, freely fused by the compiler); only the O(L^2) / O(M·4H) cores
are hand-scheduled. In-kernel "gelu" is the tanh form (Mosaic has no erf
lowering); its derivative below is the exact derivative OF the tanh form, so
the kernel's forward/backward pair is self-consistent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e9


def _f0(x):
    """float0 zero cotangent for integer primals (segment ids, seeds)."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _dropout_threshold(rate: float) -> int:
    # keep iff bits >= thr  =>  P(keep) = 1 - rate
    return min(int(rate * 2**32), 2**32 - 1)


# ---------------------------------------------------------------------------
# attention block
# ---------------------------------------------------------------------------


def _attn_train_fwd_kernel(
    seed_ref,  # (1,) int32 SMEM
    seg_ref,  # (1, 1, L) int32
    h_ref,  # (1, L, H) compute dtype
    wqkv_ref,  # (3, H, Hn) compute dtype
    bqkv_ref,  # (3, 1, Hn) f32
    wo_ref,  # (Hn, H) compute dtype
    bo_ref,  # (1, H) f32
    o_ref,  # (1, L, H) compute dtype
    *,
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    drop_thr: int,
    keep_prob: float,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = h_ref[0]  # (L, H)
    seg = seg_ref[0, 0]
    allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)

    q = (
        jnp.dot(x, wqkv_ref[0], preferred_element_type=jnp.float32) + bqkv_ref[0]
    ).astype(x.dtype)
    k = (
        jnp.dot(x, wqkv_ref[1], preferred_element_type=jnp.float32) + bqkv_ref[1]
    ).astype(x.dtype)
    v = (
        jnp.dot(x, wqkv_ref[2], preferred_element_type=jnp.float32) + bqkv_ref[2]
    ).astype(x.dtype)

    if drop_thr > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    hd = head_dim
    parts = []
    for h in range(num_heads):
        col = slice(h * hd, (h + 1) * hd)
        scores = (
            jax.lax.dot_general(
                q[:, col], k[:, col], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + bias
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m).astype(x.dtype))  # bf16 exp: 2x VPU rate
        denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        if drop_thr > 0:
            bits = pltpu.prng_random_bits((e.shape[0], e.shape[1]))
            keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
            e = jnp.where(keep, e, jnp.zeros_like(e))
            denom = denom * keep_prob
        ctxh = jax.lax.dot_general(
            e, v[:, col], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append((ctxh / denom).astype(x.dtype))
    ctx = jnp.concatenate(parts, axis=1)  # (L, Hn)
    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_train_bwd_kernel(
    seed_ref,
    seg_ref,
    h_ref,
    wqkv_ref,
    bqkv_ref,
    wo_ref,
    g_ref,  # (1, L, H) compute dtype — upstream cotangent
    dx_ref,  # (1, L, H) compute dtype
    dwqkv_ref,  # (3, H, Hn) f32, accumulated across the batch grid
    dbqkv_ref,  # (3, 1, Hn) f32
    dwo_ref,  # (Hn, H) f32
    dbo_ref,  # (1, H) f32
    *,
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    drop_thr: int,
    keep_prob: float,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    x = h_ref[0]
    g = g_ref[0]
    seg = seg_ref[0, 0]
    allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)

    q = (
        jnp.dot(x, wqkv_ref[0], preferred_element_type=jnp.float32) + bqkv_ref[0]
    ).astype(x.dtype)
    k = (
        jnp.dot(x, wqkv_ref[1], preferred_element_type=jnp.float32) + bqkv_ref[1]
    ).astype(x.dtype)
    v = (
        jnp.dot(x, wqkv_ref[2], preferred_element_type=jnp.float32) + bqkv_ref[2]
    ).astype(x.dtype)

    # dctx = g @ Wo^T
    dctx = jax.lax.dot_general(
        g, wo_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)  # (L, Hn)

    if drop_thr > 0:
        # identical reseed + identical generation ORDER (head loop) as the
        # forward kernel => bit-identical masks, nothing saved to HBM
        pltpu.prng_seed(seed_ref[0], b)

    hd = head_dim
    ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        col = slice(h * hd, (h + 1) * hd)
        qh, kh, vh = q[:, col], k[:, col], v[:, col]
        scores = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
            + bias
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m).astype(x.dtype))  # matches fwd numerics
        D = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        if drop_thr > 0:
            bits = pltpu.prng_random_bits((e.shape[0], e.shape[1]))
            keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
            e_m = jnp.where(keep, e, jnp.zeros_like(e))
            denom_eff = D * keep_prob
        else:
            e_m = e
            denom_eff = D
        # recompute fwd output for dWo (identical op order to fwd)
        ctxh = (
            jax.lax.dot_general(
                e_m, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / denom_eff
        ).astype(x.dtype)
        ctx_parts.append(ctxh)

        dctx_h = dctx[:, col]
        # dp_eff (L, L): grad wrt the effective (post-dropout) probabilities
        dp = jax.lax.dot_general(
            dctx_h, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_eff = e_m.astype(jnp.float32) / denom_eff
        p = e.astype(jnp.float32) / D
        # softmax(+dropout) backward: dS = p_eff*dp - p * rowsum(dp * p_eff)
        # (derivation: p_eff_j = mask_j e_j / (D keep_prob), D = sum e).
        # NOTE (measured, do not "optimize"): the flash-style delta trick
        # (rowsum via dctx.ctx) + factoring e out of the difference to cut
        # (L, L) VPU passes measured a consistent ~0.3 ms/layer LOSS here —
        # this kernel is MXU-bound (6 L²·hd + 8 H×H matmuls per head loop)
        # and the f32 passes below hide under the MXU; the restructure only
        # serialized the pipeline (see ROUND1_NOTES round-3 section).
        rs = jnp.sum(dp * p_eff, axis=-1, keepdims=True)
        dS = ((p_eff * dp - p * rs) * sm_scale).astype(x.dtype)
        dq_parts.append(
            jax.lax.dot_general(
                dS, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dk_parts.append(
            jax.lax.dot_general(
                dS, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dv_parts.append(
            jax.lax.dot_general(
                p_eff.astype(x.dtype), dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )

    ctx = jnp.concatenate(ctx_parts, axis=1)  # (L, Hn) compute dtype
    dq = jnp.concatenate(dq_parts, axis=1).astype(x.dtype)
    dk = jnp.concatenate(dk_parts, axis=1).astype(x.dtype)
    dv = jnp.concatenate(dv_parts, axis=1).astype(x.dtype)

    dx = (
        jax.lax.dot_general(
            dq, wqkv_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            dk, wqkv_ref[1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            dv, wqkv_ref[2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)

    def wgrad(lhs, rhs):  # lhs (L, H), rhs (L, Hn) -> (H, Hn) f32
        return jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dwq = wgrad(x, dq)
    dwk = wgrad(x, dk)
    dwv = wgrad(x, dv)
    dwo = jax.lax.dot_general(
        ctx, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbq = jnp.sum(dq.astype(jnp.float32), axis=0, keepdims=True)
    dbk = jnp.sum(dk.astype(jnp.float32), axis=0, keepdims=True)
    dbv = jnp.sum(dv.astype(jnp.float32), axis=0, keepdims=True)
    dbo = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(b == 0)
    def _():
        dwqkv_ref[0] = dwq
        dwqkv_ref[1] = dwk
        dwqkv_ref[2] = dwv
        dbqkv_ref[0] = dbq
        dbqkv_ref[1] = dbk
        dbqkv_ref[2] = dbv
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo

    @pl.when(b > 0)
    def _():
        dwqkv_ref[0] += dwq
        dwqkv_ref[1] += dwk
        dwqkv_ref[2] += dwv
        dbqkv_ref[0] += dbq
        dbqkv_ref[1] += dbk
        dbqkv_ref[2] += dbv
        dwo_ref[:] += dwo
        dbo_ref[:] += dbo


def _attn_specs(B, L, H, Hn):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        pl.BlockSpec((3, H, Hn), lambda b: (0, 0, 0)),
        pl.BlockSpec((3, 1, Hn), lambda b: (0, 0, 0)),
        pl.BlockSpec((Hn, H), lambda b: (0, 0)),
        pl.BlockSpec((1, H), lambda b: (0, 0)),
    ]


@functools.lru_cache(maxsize=None)
def make_attention_train(num_heads: int, head_dim: int, sm_scale: float,
                         rate: float, interpret: bool):
    """Build the custom-VJP fused training attention for a static config.

    Primals: (hidden (B,L,H) compute-dtype, segment_ids (B,L) int32,
    seed (1,) int32, wqkv (3,H,Hn) f32, bqkv (3,1,Hn) f32, wo (Hn,H) f32,
    bo (1,H) f32) -> (B, L, Hn_out=H) attention output BEFORE hidden-state
    dropout / residual / LN (those stay in XLA).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    thr = _dropout_threshold(rate) if rate > 0.0 else 0
    keep_prob = 1.0 - rate

    def fwd_call(hidden, seg, seed, wqkv, bqkv, wo, bo):
        B, L, H = hidden.shape
        Hn = wo.shape[0]
        dt = hidden.dtype
        kernel = functools.partial(
            _attn_train_fwd_kernel,
            num_heads=num_heads,
            head_dim=head_dim,
            sm_scale=sm_scale,
            drop_thr=thr,
            keep_prob=keep_prob,
        )
        flops = B * (2 * L * H * 4 * Hn + num_heads * 4 * L * L * head_dim)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=_attn_specs(B, L, H, Hn),
            out_specs=pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=2 * B * L * H * 2,
                transcendentals=B * num_heads * L * L,
            ),
            interpret=interpret,
        )(
            seed,
            seg.astype(jnp.int32)[:, None, :],
            hidden,
            wqkv.astype(dt),
            bqkv.astype(jnp.float32),
            wo.astype(dt),
            bo.astype(jnp.float32),
        )

    @jax.custom_vjp
    def attn(hidden, seg, seed, wqkv, bqkv, wo, bo):
        return fwd_call(hidden, seg, seed, wqkv, bqkv, wo, bo)

    def attn_fwd(hidden, seg, seed, wqkv, bqkv, wo, bo):
        out = fwd_call(hidden, seg, seed, wqkv, bqkv, wo, bo)
        # residuals: layer inputs only — everything else is recomputed
        return out, (hidden, seg, seed, wqkv, bqkv, wo)

    def attn_bwd(res, g):
        hidden, seg, seed, wqkv, bqkv, wo = res
        B, L, H = hidden.shape
        Hn = wo.shape[0]
        dt = hidden.dtype
        kernel = functools.partial(
            _attn_train_bwd_kernel,
            num_heads=num_heads,
            head_dim=head_dim,
            sm_scale=sm_scale,
            drop_thr=thr,
            keep_prob=keep_prob,
        )
        acc = lambda b: (0, 0, 0)
        flops = 3 * B * (2 * L * H * 4 * Hn + num_heads * 4 * L * L * head_dim)
        dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=_attn_specs(B, L, H, Hn)[:-1]  # no bo in the bwd kernel
            + [pl.BlockSpec((1, L, H), lambda b: (b, 0, 0))],
            out_specs=[
                pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
                pl.BlockSpec((3, H, Hn), acc),
                pl.BlockSpec((3, 1, Hn), acc),
                pl.BlockSpec((Hn, H), lambda b: (0, 0)),
                pl.BlockSpec((1, H), lambda b: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, L, H), dt),
                jax.ShapeDtypeStruct((3, H, Hn), jnp.float32),
                jax.ShapeDtypeStruct((3, 1, Hn), jnp.float32),
                jax.ShapeDtypeStruct((Hn, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * B * L * H * 2,
                transcendentals=B * num_heads * L * L,
            ),
            interpret=interpret,
        )(
            seed,
            seg.astype(jnp.int32)[:, None, :],
            hidden,
            wqkv.astype(dt),
            bqkv.astype(jnp.float32),
            wo.astype(dt),
            g.astype(dt),
        )
        return (dx, _f0(seg), _f0(seed), dwqkv, dbqkv, dwo, dbo)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def attention_block_train(
    hidden: Array,  # (B, L, H) compute dtype
    segment_ids: Array,  # (B, L) int32; 0 = padding
    qkv_kernel: Array,  # (H, 3, nh, hd) f32 param (raw layout)
    qkv_bias: Array,  # (3, nh, hd)
    out_kernel: Array,  # (nh, hd, H)
    out_bias: Array,  # (H,)
    seed: Array,  # (1,) int32 — dropout stream seed (ignored if rate == 0)
    sm_scale: float,
    dropout_rate: float = 0.0,
    interpret: bool = False,
) -> Array:
    """Differentiable fused attention block for the TRAINING path."""
    H, three, nh, hd = qkv_kernel.shape
    assert three == 3
    Hn = nh * hd
    wqkv = qkv_kernel.transpose(1, 0, 2, 3).reshape(3, H, Hn)
    bqkv = qkv_bias.reshape(3, 1, Hn)
    wo = out_kernel.reshape(Hn, H)
    bo = out_bias.reshape(1, H)
    fn = make_attention_train(nh, hd, float(sm_scale), float(dropout_rate),
                              bool(interpret))
    return fn(hidden, segment_ids, seed.astype(jnp.int32), wqkv, bqkv, wo, bo)


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _act(name, x):
    if name in ("gelu", "gelu_new"):
        return jax.nn.gelu(x, approximate=True)  # Mosaic has no erf
    if name == "relu":
        return jax.nn.relu(x)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(name)


def _act_grad(name, x):
    """Exact derivative of the IN-KERNEL activation (tanh-gelu form)."""
    if name in ("gelu", "gelu_new"):
        u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    if name == "relu":
        return (x > 0).astype(x.dtype)
    if name == "silu":
        s = jax.nn.sigmoid(x)
        return s * (1.0 + x * (1.0 - s))
    raise ValueError(name)


def _act_and_grad(name, x):
    """(activation(x), activation'(x)) sharing the transcendental: the
    tanh/sigmoid is evaluated ONCE for both (the bwd kernel previously paid
    it twice — once inside jax.nn.gelu, once in _act_grad)."""
    if name in ("gelu", "gelu_new"):
        u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
        t = jnp.tanh(u)
        h = 0.5 * x * (1.0 + t)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
        return h, 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    if name == "relu":
        return jax.nn.relu(x), (x > 0).astype(x.dtype)
    if name == "silu":
        s = jax.nn.sigmoid(x)
        return x * s, s * (1.0 + x * (1.0 - s))
    raise ValueError(name)


def _mlp_train_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                          activation: str):
    x = x_ref[:]  # (bm, H) compute dtype
    h = _act(
        activation,
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:],
    )
    y = (
        jnp.dot(h.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    o_ref[:] = y.astype(o_ref.dtype)


def _mlp_train_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, g_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, activation: str,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[:]
    g = g_ref[:]
    pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h, hgrad = _act_and_grad(activation, pre)
    dh = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpre = (dh * hgrad).astype(x.dtype)
    dx = jax.lax.dot_general(
        dpre, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)

    dw1 = jax.lax.dot_general(
        x, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2 = jax.lax.dot_general(
        h.astype(x.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


@functools.lru_cache(maxsize=None)
def make_mlp_train(activation: str, block_m: int, interpret: bool):
    """Custom-VJP fused MLP core y = act(x W1 + b1) W2 + b2 (no LN/dropout).

    Primals: (x (M,H) compute dtype, w1 (H,I) f32, b1 (1,I) f32, w2 (I,H) f32,
    b2 (1,H) f32). Backward recomputes the (bm, I) intermediate per block; the
    intermediate never exists in HBM in either pass.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _pad(x, bm):
        M = x.shape[0]
        Mp = ((M + bm - 1) // bm) * bm
        return (x if Mp == M else jnp.pad(x, ((0, Mp - M), (0, 0)))), Mp

    def fwd_call(x, w1, b1, w2, b2):
        M, H = x.shape
        I = w1.shape[1]
        dt = x.dtype
        bm = block_m
        while bm > M:
            bm //= 2
        bm = max(bm, 8)
        xp, Mp = _pad(x, bm)
        out = pl.pallas_call(
            functools.partial(_mlp_train_fwd_kernel, activation=activation),
            grid=(Mp // bm,),
            in_specs=[
                pl.BlockSpec((bm, H), lambda i: (i, 0)),
                pl.BlockSpec((H, I), lambda i: (0, 0)),
                pl.BlockSpec((1, I), lambda i: (0, 0)),
                pl.BlockSpec((I, H), lambda i: (0, 0)),
                pl.BlockSpec((1, H), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, H), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((Mp, H), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * Mp * H * I,
                bytes_accessed=Mp * H * 4 + 4 * H * I,
                transcendentals=Mp * I,
            ),
            interpret=interpret,
        )(xp, w1.astype(dt), b1.astype(jnp.float32), w2.astype(dt),
          b2.astype(jnp.float32))
        return out[:M] if Mp != M else out

    @jax.custom_vjp
    def mlp(x, w1, b1, w2, b2):
        return fwd_call(x, w1, b1, w2, b2)

    def mlp_fwd(x, w1, b1, w2, b2):
        return fwd_call(x, w1, b1, w2, b2), (x, w1, b1, w2)

    def mlp_bwd(res, g):
        x, w1, b1, w2 = res
        M, H = x.shape
        I = w1.shape[1]
        dt = x.dtype
        bm = block_m
        while bm > M:
            bm //= 2
        bm = max(bm, 8)
        xp, Mp = _pad(x, bm)
        gp, _ = _pad(g.astype(dt), bm)
        acc = lambda i: (0, 0)
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_mlp_train_bwd_kernel, activation=activation),
            grid=(Mp // bm,),
            in_specs=[
                pl.BlockSpec((bm, H), lambda i: (i, 0)),
                pl.BlockSpec((H, I), lambda i: (0, 0)),
                pl.BlockSpec((1, I), lambda i: (0, 0)),
                pl.BlockSpec((I, H), lambda i: (0, 0)),
                pl.BlockSpec((bm, H), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bm, H), lambda i: (i, 0)),
                pl.BlockSpec((H, I), acc),
                pl.BlockSpec((1, I), acc),
                pl.BlockSpec((I, H), acc),
                pl.BlockSpec((1, H), acc),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Mp, H), dt),
                jax.ShapeDtypeStruct((H, I), jnp.float32),
                jax.ShapeDtypeStruct((1, I), jnp.float32),
                jax.ShapeDtypeStruct((I, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=3 * 4 * Mp * H * I,
                bytes_accessed=3 * Mp * H * 4 + 4 * H * I,
                transcendentals=Mp * I,
            ),
            interpret=interpret,
        )(xp, w1.astype(dt), b1.astype(jnp.float32), w2.astype(dt), gp)
        return ((dx[:M] if Mp != M else dx), dw1, db1, dw2, db2)

    mlp.defvjp(mlp_fwd, mlp_bwd)
    return mlp


def mlp_block_train(
    x: Array,  # (M, H) compute dtype
    w1: Array,  # (H, I) f32 param
    b1: Array,  # (I,)
    w2: Array,  # (I, H)
    b2: Array,  # (H,)
    activation: str = "gelu",
    block_m: int = 512,
    interpret: bool = False,
) -> Array:
    """Differentiable fused MLP core for the TRAINING path (no residual/LN)."""
    fn = make_mlp_train(activation, int(block_m), bool(interpret))
    return fn(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
