"""Fused attention block: QKV projection + attention + output projection in
ONE Pallas kernel.

Why (profiled at BERT-base, B=128, L=512 on v5e): the separate QKV einsum
producing the attention kernel's (B, 3, nh, L, hd) layout ran at 30 TFLOPs/s
(2.52 ms/layer) because the strided 5-D store wastes half of every vector
register (trailing dim hd=64 < the 128-lane tile), and q/k/v round-trip
300 MB of HBM per layer. Fusing the projections into the attention kernel
keeps q/k/v entirely in VMEM:

  grid (B, head-groups); per step:
    x (L, H) @ w_qkv slice  -> q, k, v (L, HB*hd)      [MXU]
    per head: QK^T -> masked softmax (bf16 exp) -> PV   [MXU+VPU]
    ctx (L, HB*hd) @ w_o slice -> accumulate (L, H)     [MXU, f32 scratch]
  last group writes attn_out (B, L, H).

HBM per layer: read hidden x groups + write out — ~400 MB vs ~900 MB for the
split pipeline, and zero bad-layout stores. Masking is segment-id based
(padding + window packing in one (B, L) tensor), as in blhd_attention.py.

The reference has no custom attention at all (HF torch BertSelfAttention,
reference: emnlp2023-topic_segmentation/src/models/bert_for_ts.py:55-67).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9


from spokennlp_tpu.ops.pallas.int8_matmul import rowquant_in_kernel as _rowquant


def _attn_block_kernel(
    seg_ref,
    h_ref,
    wqkv_ref,
    swqkv_ref,
    bqkv_ref,
    wo_ref,
    swo_ref,
    bo_ref,
    lns_ref,
    lnb_ref,
    o_ref,
    acc_ref,
    *,
    heads_per_block: int,
    head_dim: int,
    sm_scale: float,
    quantized: bool,
    fuse_ln: bool,
    eps: float,
    core_int8=False,
):
    from jax.experimental import pallas as pl

    gi = pl.program_id(1)  # head group
    n_groups = pl.num_programs(1)

    x = h_ref[0]  # (L, H) compute dtype
    seg = seg_ref[0, 0]  # (L,)
    allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)  # (L, L)

    # fused QKV projection for this head group (MXU; stays in VMEM). In
    # quantized mode the weights arrive int8 (per-column scales) and the
    # activations are row-quantized here — the MXU runs at the 2x int8 rate.
    if quantized:
        x8, sx = _rowquant(x, pl)
        q = (
            (
                jnp.dot(x8, wqkv_ref[0, 0], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * swqkv_ref[0, 0]
                + bqkv_ref[0, 0]
            )
            * sm_scale
        ).astype(x.dtype)
        k = (
            jnp.dot(x8, wqkv_ref[1, 0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sx
            * swqkv_ref[1, 0]
            + bqkv_ref[1, 0]
        ).astype(x.dtype)
        v = (
            jnp.dot(x8, wqkv_ref[2, 0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sx
            * swqkv_ref[2, 0]
            + bqkv_ref[2, 0]
        ).astype(x.dtype)
    else:
        q = (
            (
                jnp.dot(x, wqkv_ref[0, 0], preferred_element_type=jnp.float32)
                + bqkv_ref[0, 0]
            )
            * sm_scale
        ).astype(x.dtype)
        k = (
            jnp.dot(x, wqkv_ref[1, 0], preferred_element_type=jnp.float32)
            + bqkv_ref[1, 0]
        ).astype(x.dtype)
        v = (
            jnp.dot(x, wqkv_ref[2, 0], preferred_element_type=jnp.float32)
            + bqkv_ref[2, 0]
        ).astype(x.dtype)

    hd = head_dim
    ctx_parts = []
    # int8 attention-CORE levers (each independently measurable):
    #  - "qk":   QK^T on the 2x int8 MXU rate. q/k get PER-TENSOR int8
    #    scales so the dequant constant c = sq*sk folds into the exp
    #    argument as one FMA on the already-needed max-subtract, NOT the
    #    per-row two-vector dequant that was measured a loss (ROUND1_NOTES).
    #  - "av":   AV on the int8 rate. probs use a STATIC scale 127
    #    (p in [0, 1] by construction) — the *127 folds into the exp
    #    argument as +ln(127), so quantizing the (L, L) probs costs only a
    #    round+cast, no abs/max pass. v is per-column int8 (contraction is
    #    over rows).
    #  - "both": both of the above.
    use_qk8 = quantized and core_int8 in ("qk", "both", True)
    use_av8 = quantized and core_int8 in ("av", "both", True)
    LN127 = 4.844187086458591  # ln(127)
    if use_qk8:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6) * (1.0 / 127.0)
        sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6) * (1.0 / 127.0)
        q8 = jnp.clip(jnp.round(qf * (1.0 / sq)), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(kf * (1.0 / sk)), -127, 127).astype(jnp.int8)
        c = (sq * sk).astype(jnp.float32)
    if use_av8:
        vf = v.astype(jnp.float32)
        sv = jnp.maximum(
            jnp.max(jnp.abs(vf), axis=0, keepdims=True), 1e-6
        ) * (1.0 / 127.0)  # (1, HB*hd)
        v8 = jnp.clip(jnp.round(vf * (1.0 / sv)), -127, 127).astype(jnp.int8)
    for h in range(heads_per_block):
        col = slice(h * hd, (h + 1) * hd)
        if use_qk8:
            s_int = jax.lax.dot_general(
                q8[:, col], k8[:, col], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            m = jnp.max(
                jnp.where(allowed, s_int, -3e38), axis=-1, keepdims=True
            )
            arg = jnp.where(allowed, (s_int - m) * c, -30.0)
        else:
            scores = (
                jax.lax.dot_general(
                    q[:, col], k[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )
            m = jnp.max(scores, axis=-1, keepdims=True)
            arg = scores - m
        if use_av8:
            p_scaled = jnp.exp(arg + LN127)  # in [0, 127]
            denom = jnp.maximum(
                jnp.sum(p_scaled, axis=-1, keepdims=True), 1e-6
            )
            p8 = jnp.clip(jnp.round(p_scaled), 0, 127).astype(jnp.int8)
            ctx_int = jax.lax.dot_general(
                p8, v8[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            ctx_parts.append(
                (ctx_int * sv[:, col] * (1.0 / denom)).astype(x.dtype)
            )
        else:
            # VPU-lean softmax: bf16 exp (2x f32 rate), normalize AFTER PV so
            # the divide runs on (L, hd) not (L, L)
            p = jnp.exp(arg.astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            ctxh = jax.lax.dot_general(
                p.astype(x.dtype),
                v[:, col],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ctx_parts.append((ctxh / denom).astype(x.dtype))
    ctx = jnp.concatenate(ctx_parts, axis=1)  # (L, HB*hd)

    if quantized:
        c8, sc = _rowquant(ctx, pl)
        part = (
            jnp.dot(c8, wo_ref[0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sc
            * swo_ref[0]
        )
    else:
        part = jnp.dot(ctx, wo_ref[0], preferred_element_type=jnp.float32)  # (L, H)

    @pl.when(gi == 0)
    def _():
        acc_ref[:] = part + bo_ref[:]

    @pl.when(gi > 0)
    def _():
        acc_ref[:] += part

    @pl.when(gi == n_groups - 1)
    def _():
        if fuse_ln:
            # h1 = LayerNorm(x + attn_out): the residual is this block's own
            # input (still in VMEM), so the whole post-LN half-layer costs no
            # extra HBM pass
            r = acc_ref[:] + x.astype(jnp.float32)
            mean = jnp.mean(r, axis=1, keepdims=True)
            c = r - mean
            var = jnp.mean(c * c, axis=1, keepdims=True)
            o_ref[0] = (
                c * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]
            ).astype(o_ref.dtype)
        else:
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _attn_block_kernel_multi(
    seg_ref,
    h_ref,
    wqkv_ref,
    swqkv_ref,
    bqkv_ref,
    wo_ref,
    swo_ref,
    bo_ref,
    lns_ref,
    lnb_ref,
    o_ref,
    *,
    seqs: int,
    num_heads: int,
    head_dim: int,
    seq_len: int,
    sm_scale: float,
    quantized: bool,
    fuse_ln: bool,
    eps: float,
):
    """Single-group (G=1) variant processing ``seqs`` sequences per grid
    step: the projection matmuls run on (seqs*L, ...) for better MXU
    utilization and fewer grid steps; attention stays per-sequence."""
    from jax.experimental import pallas as pl

    L, hd, nh = seq_len, head_dim, num_heads
    x = h_ref[:].reshape(seqs * L, nh * hd)  # (S*L, H)

    # q/k/v live in the COMPUTE dtype ((S*L, H) each; f32 would blow the
    # 16 MB VMEM budget at seqs=2) — the per-head consumers cast anyway
    if quantized:
        x8, sx = _rowquant(x.astype(jnp.float32), pl)

        def deq(s):
            return (
                jnp.dot(x8, wqkv_ref[s, 0], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * swqkv_ref[s, 0]
                + bqkv_ref[s, 0]
            )

        q = (deq(0) * sm_scale).astype(x.dtype)
        k = deq(1).astype(x.dtype)
        v = deq(2).astype(x.dtype)
    else:
        q = (
            (
                jnp.dot(x, wqkv_ref[0, 0], preferred_element_type=jnp.float32)
                + bqkv_ref[0, 0]
            )
            * sm_scale
        ).astype(x.dtype)
        k = (
            jnp.dot(x, wqkv_ref[1, 0], preferred_element_type=jnp.float32)
            + bqkv_ref[1, 0]
        ).astype(x.dtype)
        v = (
            jnp.dot(x, wqkv_ref[2, 0], preferred_element_type=jnp.float32)
            + bqkv_ref[2, 0]
        ).astype(x.dtype)

    ctx_rows = []
    for si in range(seqs):
        seg = seg_ref[si, 0]
        allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
        row = slice(si * L, (si + 1) * L)
        parts = []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            qh = q[row, col].astype(x.dtype)
            kh = k[row, col].astype(x.dtype)
            scores = (
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp((scores - m).astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            ctxh = jax.lax.dot_general(
                p.astype(x.dtype), v[row, col],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            parts.append((ctxh / denom).astype(x.dtype))
        ctx_rows.append(jnp.concatenate(parts, axis=1))
    ctx = jnp.concatenate(ctx_rows, axis=0)  # (S*L, H)

    if quantized:
        c8, sc = _rowquant(ctx.astype(jnp.float32), pl)
        part = (
            jnp.dot(c8, wo_ref[0], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sc
            * swo_ref[0]
        )
    else:
        part = jnp.dot(ctx, wo_ref[0], preferred_element_type=jnp.float32)
    part = part + bo_ref[:]

    if fuse_ln:
        r = part + x.astype(jnp.float32)
        mean = jnp.mean(r, axis=1, keepdims=True)
        c = r - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        out = c * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]
    else:
        out = part
    o_ref[:] = out.reshape(seqs, L, nh * hd).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "heads_per_block",
        "interpret",
        "quantized",
        "eps",
        "seqs_per_block",
        "core_int8",
    ),
)
def fused_attention_block(
    hidden: Array,  # (B, L, H) compute dtype (bf16 on chip)
    segment_ids: Array,  # (B, L) int32; 0 = padding, >0 = segment/window id
    qkv_kernel: Array,  # (H, 3, nh, hd) param
    qkv_bias: Array,  # (3, nh, hd) param
    out_kernel: Array,  # (nh, hd, H) param
    out_bias: Array,  # (H,) param
    sm_scale: float,
    heads_per_block: int = 12,
    interpret: bool = False,
    quantized: bool = False,
    ln_scale: Optional[Array] = None,  # (H,) — fuse h1 = LN(x + attn) epilogue
    ln_bias: Optional[Array] = None,
    eps: float = 1e-12,
    seqs_per_block: int = 1,  # >1: single-group multi-sequence kernel
    core_int8=False,  # False | "qk" | "av" | "both": int8 attention core; W8A8 only
) -> Array:
    """Full attention block (QKV proj -> MHA -> out proj); returns (B, L, H).

    ``quantized``: run the two projections W8A8 (int8 weights prepared here
    with per-column scales; activations row-quantized in-kernel). Measured
    HB sweep on v5e (B=128, L=512, H=768): HB=12 (one group) beats HB=4 by
    ~8% — one hidden read instead of three.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = hidden.shape
    _, three, nh, hd = qkv_kernel.shape
    assert three == 3
    HB = heads_per_block if nh % heads_per_block == 0 else 1
    G = nh // HB
    dt = hidden.dtype

    # rearrange params for grouped, matmul-friendly access (small; XLA-fused)
    wqkv = (
        qkv_kernel.transpose(1, 2, 0, 3)  # (3, nh, H, hd)
        .reshape(3, G, HB, H, hd)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, G, H, HB * hd)
    )
    bqkv = qkv_bias.reshape(3, G, 1, HB * hd).astype(jnp.float32)
    wo = out_kernel.reshape(G, HB * hd, H)
    bo = out_bias.reshape(1, H).astype(jnp.float32)

    if quantized:
        wf = wqkv.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=2, keepdims=True), 1e-6)
        swqkv = amax / 127.0  # (3, G, 1, HB*hd)
        wqkv = jnp.clip(jnp.round(wf / swqkv), -127, 127).astype(jnp.int8)
        wof = wo.astype(jnp.float32)
        oamax = jnp.maximum(jnp.max(jnp.abs(wof), axis=1, keepdims=True), 1e-6)
        swo = oamax / 127.0  # (G, 1, H)
        wo = jnp.clip(jnp.round(wof / swo), -127, 127).astype(jnp.int8)
    else:
        wqkv = wqkv.astype(dt)
        wo = wo.astype(dt)
        swqkv = jnp.ones((3, G, 1, HB * hd), jnp.float32)
        swo = jnp.ones((G, 1, H), jnp.float32)

    fuse_ln = ln_scale is not None
    lns = (ln_scale if fuse_ln else jnp.ones((H,))).astype(jnp.float32).reshape(1, H)
    lnb = (ln_bias if fuse_ln else jnp.zeros((H,))).astype(jnp.float32).reshape(1, H)

    flops = B * (2 * 3 * L * H * nh * hd + nh * 4 * L * L * hd + 2 * L * nh * hd * H)

    S = seqs_per_block
    if S > 1 and G == 1 and B % S == 0:
        kernel = functools.partial(
            _attn_block_kernel_multi,
            seqs=S,
            num_heads=nh,
            head_dim=hd,
            seq_len=L,
            sm_scale=float(sm_scale),
            quantized=quantized,
            fuse_ln=fuse_ln,
            eps=float(eps),
        )
        return pl.pallas_call(
            kernel,
            grid=(B // S,),
            in_specs=[
                pl.BlockSpec((S, 1, L), lambda b: (b, 0, 0)),
                pl.BlockSpec((S, L, H), lambda b: (b, 0, 0)),
                pl.BlockSpec((3, 1, H, HB * hd), lambda b: (0, 0, 0, 0)),
                pl.BlockSpec((3, 1, 1, HB * hd), lambda b: (0, 0, 0, 0)),
                pl.BlockSpec((3, 1, 1, HB * hd), lambda b: (0, 0, 0, 0)),
                pl.BlockSpec((1, HB * hd, H), lambda b: (0, 0, 0)),
                pl.BlockSpec((1, 1, H), lambda b: (0, 0, 0)),
                pl.BlockSpec((1, H), lambda b: (0, 0)),
                pl.BlockSpec((1, H), lambda b: (0, 0)),
                pl.BlockSpec((1, H), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((S, L, H), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=B * L * H * 4,
                transcendentals=B * nh * L * L,
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
            lns,
            lnb,
        )

    kernel = functools.partial(
        _attn_block_kernel,
        heads_per_block=HB,
        head_dim=hd,
        sm_scale=float(sm_scale),
        quantized=quantized,
        fuse_ln=fuse_ln,
        eps=float(eps),
        core_int8=core_int8,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=[
            # (B, 1, L): middle singleton keeps the block's trailing two dims
            # equal to the array dims (Mosaic tiling constraint)
            pl.BlockSpec((1, 1, L), lambda b, g: (b, 0, 0)),
            pl.BlockSpec((1, L, H), lambda b, g: (b, 0, 0)),
            pl.BlockSpec((3, 1, H, HB * hd), lambda b, g: (0, g, 0, 0)),
            pl.BlockSpec((3, 1, 1, HB * hd), lambda b, g: (0, g, 0, 0)),
            pl.BlockSpec((3, 1, 1, HB * hd), lambda b, g: (0, g, 0, 0)),
            pl.BlockSpec((1, HB * hd, H), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((1, H), lambda b, g: (0, 0)),
            pl.BlockSpec((1, H), lambda b, g: (0, 0)),
            pl.BlockSpec((1, H), lambda b, g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H), lambda b, g: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
        scratch_shapes=[pltpu.VMEM((L, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * G * L * H * 2 + B * L * H * 2,
            transcendentals=B * nh * L * L,
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
        lns,
        lnb,
    )


def reference_attention_block(
    hidden, segment_ids, qkv_kernel, qkv_bias, out_kernel, out_bias, sm_scale
):
    """XLA oracle with identical math (f32 softmax; test tolerance covers
    the kernel's bf16 exp)."""
    qkv = jnp.einsum("blh,hsnd->blsnd", hidden.astype(jnp.float32),
                     qkv_kernel.astype(jnp.float32)) + qkv_bias.astype(jnp.float32)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, nh, hd)
    scores = jnp.einsum("blnd,bmnd->bnlm", q * sm_scale, k)
    seg = segment_ids
    allowed = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
    scores = jnp.where(allowed[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bnlm,bmnd->blnd", probs, v)
    out = jnp.einsum("blnd,ndh->blh", ctx, out_kernel.astype(jnp.float32))
    return (out + out_bias.astype(jnp.float32)).astype(hidden.dtype)
