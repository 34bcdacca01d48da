"""Fused Longformer attention block: QKV projections + banded sliding-window
attention + global-token attention + output projection (+ residual + LN) in
ONE Pallas kernel per layer.

The reference runs HF's torch Longformer (reference:
emnlp2023-topic_segmentation/src/models/longformer_for_ts.py:19-120, global
CLS attention set at :55-58). The XLA formulation here
(ops/sliding_attention.py chunked path + the encoder's global pass) is exact
but round-trips q/k/v and the (L, 3C) score band through HBM per layer; this
kernel keeps everything in VMEM:

  grid (B,); per step (one sequence):
    x (L, H) @ w_qkv          -> q, k, v           [MXU, optionally W8A8]
    x (L, H) @ w_qkv_global   -> kg, vg (+ qg for the G prefix rows)
    per head, fori over L/C row chunks:
      q_chunk (C, hd) @ k_band (3C, hd)^T  -> banded scores   [MXU]
      q_chunk @ k[:G]^T                    -> global-key scores
      shared-max softmax over [band | global cols] (bf16 exp)  [VPU]
      P_band @ v_band + P_g @ v[:G]        -> ctx chunk        [MXU]
    global rows (first G positions): full attention via the *_global
    projections, replacing their local rows (HF Longformer semantics)
    ctx (L, H) @ w_o (+ bias + residual + LayerNorm epilogue)  [MXU+VPU]

Semantics contract (enforced by the caller): global tokens may only occur in
the first ``max_globals`` positions (the topic-seg models mark CLS only).
Window convention matches ops/sliding_attention.py: each token attends to
|i - j| <= window // 2.

Oracle for tests: the encoder's einsum-bias sliding path
(sliding_window_attention_mask_bias + the XLA global pass).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9

from spokennlp_tpu.ops.pallas.int8_matmul import rowquant_in_kernel as _rowquant


def _sliding_block_kernel(
    seg_ref,  # (1, 1, L) int32: 0 = pad, 1 = valid
    glob_ref,  # (1, 1, L) int32: 1 = global token (prefix-only contract)
    h_ref,  # (1, L, H) compute dtype
    wqkv_ref,  # (3, H, H) int8 | dt
    swqkv_ref,  # (3, 1, H) f32
    bqkv_ref,  # (3, 1, H) f32
    wg_ref,  # (3, H, H) global projections
    swg_ref,
    bg_ref,
    wo_ref,  # (H, H)
    swo_ref,  # (1, H)
    bo_ref,  # (1, H)
    lns_ref,  # (1, H)
    lnb_ref,  # (1, H)
    o_ref,  # (1, L, H)
    q_s,  # scratch (L, H) dt
    kp_s,  # scratch (L + 2C, H) dt — C zero-rows of padding on both sides
    vp_s,  # scratch (L + 2C, H) dt
    ctx_s,  # scratch (L, H) f32
    *,
    num_heads: int,
    head_dim: int,
    seq_len: int,
    half: int,  # C = window // 2
    n_globals: int,  # G: width of the global-column block / prefix length
    sm_scale: float,
    quantized: bool,
    fuse_ln: bool,
    eps: float,
    global_rows: bool,  # False = caller promises zero global tokens
):
    from jax.experimental import pallas as pl

    L, C, G = seq_len, half, n_globals
    nh, hd = num_heads, head_dim
    H = nh * hd
    nc = L // C

    x = h_ref[0]  # (L, H)
    seg2 = seg_ref[0]  # (1, L)
    glb2 = glob_ref[0]  # (1, L)
    # contract (see caller): padding is a suffix, globals are a prefix — so
    # both masks collapse to two scalars and every (C, 3C) mask below is pure
    # iota math (no gathers/reshapes of mask vectors in-kernel)
    n_valid = jnp.sum((seg2 > 0).astype(jnp.int32))
    n_glob = jnp.sum((glb2 > 0).astype(jnp.int32))

    # ---- stage A: projections into VMEM scratch -------------------------
    if quantized:
        x8, sx = _rowquant(x.astype(jnp.float32), pl)

        def proj(w_ref, s_ref, b_ref, idx):
            return (
                jnp.dot(x8, w_ref[idx], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * s_ref[idx]
                + b_ref[idx]
            )

    else:

        def proj(w_ref, s_ref, b_ref, idx):
            return (
                jnp.dot(x, w_ref[idx], preferred_element_type=jnp.float32)
                + b_ref[idx]
            )

    q_s[:] = (proj(wqkv_ref, swqkv_ref, bqkv_ref, 0) * sm_scale).astype(x.dtype)
    zpad = jnp.zeros((C, H), x.dtype)
    kp_s[0:C, :] = zpad
    kp_s[C : C + L, :] = proj(wqkv_ref, swqkv_ref, bqkv_ref, 1).astype(x.dtype)
    kp_s[C + L :, :] = zpad
    vp_s[0:C, :] = zpad
    vp_s[C : C + L, :] = proj(wqkv_ref, swqkv_ref, bqkv_ref, 2).astype(x.dtype)
    vp_s[C + L :, :] = zpad

    # global-key columns: the first G positions, valid where marked global
    gi = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    gbias = jnp.where(gi < n_glob, 0.0, NEG_INF).astype(jnp.float32)

    # per-chunk iota scaffolding for the banded mask: for query chunk i,
    # absolute query row r = i*C + ci and key position key = i*C - C + cj;
    # allowed iff |key - r| <= C, 0 <= key < n_valid (suffix padding), and
    # key >= n_glob (global keys attend through the G columns instead)
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 1)
    in_band = jnp.abs(cj - C - ci) <= C  # translation-invariant part

    # ---- stage C: banded attention, chunk fori outer / heads unrolled ----
    # full-width (C, H) ref loads + per-head VALUE slicing (the dense
    # attention-block kernel's proven Mosaic pattern; lane-offset ref slices
    # are avoided)
    gk_all = kp_s[C : C + G, :]  # (G, H) global keys (standard projections)
    gv_all = vp_s[C : C + G, :]

    def chunk_body(i, _):
        r0 = i * C
        key_abs = r0 - C + cj
        allowed = in_band & (key_abs >= n_glob) & (key_abs < n_valid)
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
        qc = q_s[pl.ds(r0, C), :]  # (C, H)
        kb = kp_s[pl.ds(r0, 3 * C), :]  # (3C, H) band
        vb = vp_s[pl.ds(r0, 3 * C), :]
        parts = []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            sc = (
                jax.lax.dot_general(
                    qc[:, col], kb[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )  # (C, 3C)
            gsc = (
                jax.lax.dot_general(
                    qc[:, col], gk_all[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + gbias
            )  # (C, G)
            # shared-max softmax over [band | global] without concatenating
            m = jnp.maximum(
                jnp.max(sc, axis=-1, keepdims=True),
                jnp.max(gsc, axis=-1, keepdims=True),
            )
            p = jnp.exp((sc - m).astype(x.dtype))
            pg = jnp.exp((gsc - m).astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32) + jnp.sum(
                pg, axis=-1, keepdims=True, dtype=jnp.float32
            )
            ctxh = jax.lax.dot_general(
                p.astype(x.dtype), vb[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                pg.astype(x.dtype), gv_all[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(ctxh / denom)
        ctx_s[pl.ds(r0, C), :] = jnp.concatenate(parts, axis=1)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)

    # ---- stage D: global rows via the *_global projections --------------
    # (HF semantics: global-position queries re-attend to the whole sequence
    # through dedicated projections; their rows replace the local result.)
    if not global_rows:
        ctx = ctx_s[:]
    elif quantized:
        xg8 = x8[:G]
        sxg = sx[:G]

        def gproj(idx, xq, sq):
            return (
                jnp.dot(xq, wg_ref[idx], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sq
                * swg_ref[idx]
                + bg_ref[idx]
            )

        qg = (gproj(0, xg8, sxg) * sm_scale).astype(x.dtype)  # (G, H)
        kg = gproj(1, x8, sx).astype(x.dtype)  # (L, H)
        vg = gproj(2, x8, sx).astype(x.dtype)
    else:
        xg = x[:G]

        def gproj(idx, xq):
            return (
                jnp.dot(xq, wg_ref[idx], preferred_element_type=jnp.float32)
                + bg_ref[idx]
            )

        qg = (gproj(0, xg) * sm_scale).astype(x.dtype)
        kg = gproj(1, x).astype(x.dtype)
        vg = gproj(2, x).astype(x.dtype)

    if global_rows:
        li = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        key_bias = jnp.where(li < n_valid, 0.0, NEG_INF).astype(jnp.float32)
        cg_parts = []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            sc = (
                jax.lax.dot_general(
                    qg[:, col], kg[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + key_bias
            )  # (G, L)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp((sc - m).astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            cgh = jax.lax.dot_general(
                p.astype(x.dtype), vg[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cg_parts.append(cgh / denom)
        cg = jnp.concatenate(cg_parts, axis=1)  # (G, H) f32

        ri = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        row_is_global = ri < n_glob  # (L, 1); prefix-only by contract
        cg_pad = jnp.concatenate([cg, jnp.zeros((L - G, H), jnp.float32)], axis=0)
        ctx = jnp.where(row_is_global, cg_pad, ctx_s[:])

    # ---- stage E: output projection (+ residual + LN) -------------------
    if quantized:
        c8, sc_ = _rowquant(ctx, pl)
        out = (
            jnp.dot(c8, wo_ref[:], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sc_
            * swo_ref[:]
        )
    else:
        out = jnp.dot(
            ctx.astype(x.dtype), wo_ref[:], preferred_element_type=jnp.float32
        )
    out = out + bo_ref[:]
    if fuse_ln:
        r = out + x.astype(jnp.float32)
        mean = jnp.mean(r, axis=1, keepdims=True)
        c = r - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        o_ref[0] = (
            c * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]
        ).astype(o_ref.dtype)
    else:
        o_ref[0] = out.astype(o_ref.dtype)


def _prep_qkv(kernel: Array, bias: Array, quantized: bool, dt):
    """(H, 3, nh, hd)/(3, nh, hd) -> (3, H, H) weights (+ per-col scales)."""
    H = kernel.shape[0]
    w = kernel.transpose(1, 0, 2, 3).reshape(3, H, H)
    b = bias.reshape(3, 1, H).astype(jnp.float32)
    if quantized:
        wf = w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-6)
        s = amax / 127.0  # (3, 1, H)
        w = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    else:
        w = w.astype(dt)
        s = jnp.ones((3, 1, H), jnp.float32)
    return w, s, b


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "window",
        "max_globals",
        "quantized",
        "eps",
        "interpret",
        "global_rows",
    ),
)
def fused_sliding_attention_block(
    hidden: Array,  # (B, L, H) compute dtype
    attention_mask: Array,  # (B, L) int, 1 = real token
    global_mask: Array,  # (B, L) int, 1 = global; prefix-only contract
    qkv_kernel: Array,  # (H, 3, nh, hd)
    qkv_bias: Array,  # (3, nh, hd)
    gqkv_kernel: Array,  # (H, 3, nh, hd) global projections
    gqkv_bias: Array,
    out_kernel: Array,  # (nh, hd, H)
    out_bias: Array,  # (H,)
    sm_scale: float,
    window: int,
    max_globals: int = 8,
    quantized: bool = False,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    eps: float = 1e-12,
    interpret: bool = False,
    global_rows: bool = True,  # False = statically no global tokens: skip
    #                            the *_global projections and row replacement
) -> Array:
    """Longformer attention block; returns (B, L, H) (post-LN if ln_* given).

    Constraints: L % (window // 2) == 0, window // 2 % 8 == 0, and global
    tokens only in the first ``max_globals`` positions (callers that build
    the CLS-only mask satisfy this by construction).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = hidden.shape
    _, three, nh, hd = qkv_kernel.shape
    assert three == 3
    C = window // 2
    assert L % C == 0 and C % 8 == 0, (L, C)
    # global-column block width: >= 8 for sane tiling, never beyond L
    G = min(max(int(max_globals), 8), L)
    dt = hidden.dtype

    wqkv, swqkv, bqkv = _prep_qkv(qkv_kernel, qkv_bias, quantized, dt)
    wg, swg, bg = _prep_qkv(gqkv_kernel, gqkv_bias, quantized, dt)
    wo = out_kernel.reshape(H, H)
    bo = out_bias.reshape(1, H).astype(jnp.float32)
    if quantized:
        wof = wo.astype(jnp.float32)
        oamax = jnp.maximum(jnp.max(jnp.abs(wof), axis=0, keepdims=True), 1e-6)
        swo = oamax / 127.0
        wo = jnp.clip(jnp.round(wof / swo), -127, 127).astype(jnp.int8)
    else:
        wo = wo.astype(dt)
        swo = jnp.ones((1, H), jnp.float32)

    fuse_ln = ln_scale is not None
    lns = (ln_scale if fuse_ln else jnp.ones((H,))).astype(jnp.float32).reshape(1, H)
    lnb = (ln_bias if fuse_ln else jnp.zeros((H,))).astype(jnp.float32).reshape(1, H)

    kernel = functools.partial(
        _sliding_block_kernel,
        num_heads=nh,
        head_dim=hd,
        seq_len=L,
        half=C,
        n_globals=G,
        sm_scale=float(sm_scale),
        quantized=quantized,
        fuse_ln=fuse_ln,
        eps=float(eps),
        global_rows=global_rows,
    )
    flops = B * (
        2 * 3 * L * H * H  # local qkv
        + 2 * 3 * L * H * H  # global projections (kg, vg full; qg ~ G rows)
        + nh * (L * 3 * C + L * G) * hd * 4  # banded + global-col attention
        + nh * G * L * hd * 4  # global rows
        + 2 * L * H * H  # out proj
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((3, H, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((3, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((3, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((3, H, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((3, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((3, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((H, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
        scratch_shapes=[
            pltpu.VMEM((L, H), dt),
            pltpu.VMEM((L + 2 * C, H), dt),
            pltpu.VMEM((L + 2 * C, H), dt),
            pltpu.VMEM((L, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * L * H * 4,
            transcendentals=B * nh * L * (3 * C + G),
        ),
        interpret=interpret,
    )(
        attention_mask.astype(jnp.int32)[:, None, :],
        global_mask.astype(jnp.int32)[:, None, :],
        hidden,
        wqkv,
        swqkv,
        bqkv,
        wg,
        swg,
        bg,
        wo,
        swo,
        bo,
        lns,
        lnb,
    )
