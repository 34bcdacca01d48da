"""Fused BigBird attention block: QKV projection + block-sparse attention +
output projection (+ residual + LN) in ONE Pallas kernel per layer.

Same skeleton as the fused Longformer kernel (ops/pallas/sliding_block.py),
adapted to BigBird's ITC pattern (reference backbone:
emnlp2023-topic_segmentation/src/models/bigbird_for_ts.py; our XLA gather
formulation in ops/bigbird_attention.py is its exact-semantics oracle):

  grid (B,); per step (one sequence):
    x (L, H) @ w_qkv -> q, k, v (VMEM-resident, optionally W8A8)
    per query block (fori over L/bsz chunks, heads unrolled):
      window scores   q_blk @ [blocks i-1, i, i+1]   (shifted slabs, no
                                                      gather, no duplication)
      global scores   q_blk @ blocks [0, G)          (static prefix slice)
      random scores   q_blk @ R blocks via a STATIC (nb, R) index table
                      read from SMEM -> dynamic-start VMEM loads
      one shared-max softmax across all pieces (no concatenation)
    global-block ROWS (first G*bsz) re-attend densely over all keys with the
    same projections (BigBird ITC has no separate global projections)
    ctx @ w_o + bias (+ residual + LayerNorm epilogue)

Contract: padding is a SUFFIX (the windowing featurizer right-pads), so the
key-validity mask collapses to one scalar (n_valid) and every mask is iota
math. Random-block indices are drawn host-side from the same seeded RNG as
the oracle and baked in as a static table — identical attention pattern.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e9

from spokennlp_tpu.ops.bigbird_attention import bigbird_block_indices
from spokennlp_tpu.ops.pallas.int8_matmul import rowquant_in_kernel as _rowquant


def _bigbird_block_kernel(
    mask_ref,  # (1, 1, L) int32
    ridx_ref,  # (nb, R) int32 in SMEM: random key-block ids per query block
    rok_ref,  # (nb, R) int32 in SMEM: 1 = real random block, 0 = pad entry
    h_ref,  # (1, L, H)
    wqkv_ref,  # (3, H, H)
    swqkv_ref,  # (3, 1, H)
    bqkv_ref,  # (3, 1, H)
    wo_ref,  # (H, H)
    swo_ref,  # (1, H)
    bo_ref,  # (1, H)
    lns_ref,  # (1, H)
    lnb_ref,  # (1, H)
    o_ref,  # (1, L, H)
    q_s,  # scratch (L, H) dt
    kp_s,  # scratch (L + 2C, H) dt — C zero rows both sides (window slabs)
    vp_s,  # scratch (L + 2C, H) dt
    ctx_s,  # scratch (L, H) f32
    *,
    num_heads: int,
    head_dim: int,
    seq_len: int,
    block_size: int,
    n_global_blocks: int,
    n_random: int,
    sm_scale: float,
    quantized: bool,
    fuse_ln: bool,
    eps: float,
):
    from jax.experimental import pallas as pl

    L, C = seq_len, block_size
    nh, hd = num_heads, head_dim
    H = nh * hd
    nb = L // C
    G = n_global_blocks
    Gk = G * C  # global key width (prefix)
    R = n_random

    x = h_ref[0]  # (L, H)
    mask2 = mask_ref[0]  # (1, L)
    n_valid = jnp.sum((mask2 > 0).astype(jnp.int32))

    # ---- projections into VMEM scratch (sliding_block.py pattern) --------
    if quantized:
        x8, sx = _rowquant(x.astype(jnp.float32), pl)

        def proj(idx):
            return (
                jnp.dot(x8, wqkv_ref[idx], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * swqkv_ref[idx]
                + bqkv_ref[idx]
            )

    else:

        def proj(idx):
            return (
                jnp.dot(x, wqkv_ref[idx], preferred_element_type=jnp.float32)
                + bqkv_ref[idx]
            )

    q_s[:] = (proj(0) * sm_scale).astype(x.dtype)
    zpad = jnp.zeros((C, H), x.dtype)
    kp_s[0:C, :] = zpad
    kp_s[C : C + L, :] = proj(1).astype(x.dtype)
    kp_s[C + L :, :] = zpad
    vp_s[0:C, :] = zpad
    vp_s[C : C + L, :] = proj(2).astype(x.dtype)
    vp_s[C + L :, :] = zpad

    # iota scaffolding (shared across chunks)
    cj3 = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 1)
    cj1 = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    gj = jax.lax.broadcasted_iota(jnp.int32, (C, Gk), 1)
    gbias = jnp.where(gj < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    gk_all = kp_s[C : C + Gk, :]  # (Gk, H) global key blocks
    gv_all = vp_s[C : C + Gk, :]

    # ---- block-sparse attention: chunk fori outer / heads unrolled -------
    def chunk_body(i, _):
        r0 = i * C
        # window band [blocks i-1, i, i+1]: absolute key = r0 - C + cj3;
        # exclude global blocks (they get their own columns) and invalid keys
        key_abs = r0 - C + cj3
        wbias = jnp.where(
            (key_abs >= Gk) & (key_abs < n_valid), 0.0, NEG_INF
        ).astype(jnp.float32)
        qc = q_s[pl.ds(r0, C), :]  # (C, H)
        kb = kp_s[pl.ds(r0, 3 * C), :]
        vb = vp_s[pl.ds(r0, 3 * C), :]
        # random blocks: scalar ids from SMEM -> dynamic VMEM loads
        rks, rvs, rbias = [], [], []
        for r in range(R):
            bidx = ridx_ref[i, r]
            rks.append(kp_s[pl.ds(C + bidx * C, C), :])
            rvs.append(vp_s[pl.ds(C + bidx * C, C), :])
            key_abs_r = bidx * C + cj1
            ok = (rok_ref[i, r] > 0) & (key_abs_r < n_valid)
            rbias.append(jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32))

        parts = []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)

            def dot_qk(keys):
                return jax.lax.dot_general(
                    qc[:, col], keys[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            sw = dot_qk(kb) + wbias  # (C, 3C)
            sg = dot_qk(gk_all) + gbias  # (C, Gk)
            srs = [dot_qk(rks[r]) + rbias[r] for r in range(R)]  # (C, C) x R
            m = jnp.max(sw, axis=-1, keepdims=True)
            m = jnp.maximum(m, jnp.max(sg, axis=-1, keepdims=True))
            for sr in srs:
                m = jnp.maximum(m, jnp.max(sr, axis=-1, keepdims=True))
            pw = jnp.exp((sw - m).astype(x.dtype))
            pg = jnp.exp((sg - m).astype(x.dtype))
            prs = [jnp.exp((sr - m).astype(x.dtype)) for sr in srs]
            denom = (
                jnp.sum(pw, axis=-1, keepdims=True, dtype=jnp.float32)
                + jnp.sum(pg, axis=-1, keepdims=True, dtype=jnp.float32)
            )
            for pr in prs:
                denom = denom + jnp.sum(pr, axis=-1, keepdims=True,
                                        dtype=jnp.float32)

            def dot_pv(p, vals):
                return jax.lax.dot_general(
                    p.astype(x.dtype), vals[:, col], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            ctxh = dot_pv(pw, vb) + dot_pv(pg, gv_all)
            for r in range(R):
                ctxh = ctxh + dot_pv(prs[r], rvs[r])
            parts.append(ctxh / denom)
        ctx_s[pl.ds(r0, C), :] = jnp.concatenate(parts, axis=1)
        return 0

    jax.lax.fori_loop(0, nb, chunk_body, 0)

    # ---- global-block ROWS: dense attention over all keys ----------------
    if Gk > 0:
        qg = q_s[0:Gk, :]  # (Gk, H) — already sm_scale-scaled
        k_all = kp_s[C : C + L, :]
        v_all = vp_s[C : C + L, :]
        li = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        key_bias = jnp.where(li < n_valid, 0.0, NEG_INF).astype(jnp.float32)
        cg_parts = []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            sc = (
                jax.lax.dot_general(
                    qg[:, col], k_all[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + key_bias
            )  # (Gk, L)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp((sc - m).astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            cgh = jax.lax.dot_general(
                p.astype(x.dtype), v_all[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cg_parts.append(cgh / denom)
        ctx_s[0:Gk, :] = jnp.concatenate(cg_parts, axis=1)

    ctx = ctx_s[:]

    # ---- output projection (+ residual + LN) -----------------------------
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size",
        "num_global_blocks",
        "num_random_blocks",
        "seed",
        "sm_scale",
        "quantized",
        "eps",
        "interpret",
    ),
)
def fused_bigbird_attention_block(
    hidden: Array,  # (B, L, H)
    attention_mask: Array,  # (B, L) int; suffix padding
    qkv_kernel: Array,  # (H, 3, nh, hd)
    qkv_bias: Array,  # (3, nh, hd)
    out_kernel: Array,  # (nh, hd, H)
    out_bias: Array,  # (H,)
    block_size: int,
    num_global_blocks: int,
    num_random_blocks: int,
    seed: int,
    sm_scale: float,
    quantized: bool = False,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    eps: float = 1e-12,
    interpret: bool = False,
) -> Array:
    """BigBird ITC attention block; returns (B, L, H) (post-LN if ln_*)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = hidden.shape
    _, three, nh, hd = qkv_kernel.shape
    assert three == 3
    C = block_size
    assert L % C == 0 and C % 8 == 0, (L, C)
    nb = L // C
    G = min(num_global_blocks, nb)
    R = num_random_blocks
    dt = hidden.dtype

    # same host-side random table as the oracle: rows are [globals | window |
    # random]; the kernel regenerates window/global structurally and takes
    # only the random tail (+ a validity flag for the padded-self entries)
    idx_np = bigbird_block_indices(nb, G, R, seed)
    rand_np = idx_np[:, G + 3 :] if R > 0 else np.zeros((nb, 0), np.int32)
    win_np = idx_np[:, G : G + 3]
    rok_np = np.ones_like(rand_np)
    for i in range(nb):
        seen = set(int(b) for b in idx_np[i, : G + 3])
        for r in range(rand_np.shape[1]):
            b = int(rand_np[i, r])
            if b in seen:  # padded-self fallback (short sequences)
                rok_np[i, r] = 0
            seen.add(b)
    del win_np

    wqkv = qkv_kernel.transpose(1, 0, 2, 3).reshape(3, H, H)
    bqkv = qkv_bias.reshape(3, 1, H).astype(jnp.float32)
    wo = out_kernel.reshape(H, H)
    bo = out_bias.reshape(1, H).astype(jnp.float32)
    if quantized:
        wf = wqkv.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-6)
        swqkv = amax / 127.0
        wqkv = jnp.clip(jnp.round(wf / swqkv), -127, 127).astype(jnp.int8)
        wof = wo.astype(jnp.float32)
        oamax = jnp.maximum(jnp.max(jnp.abs(wof), axis=0, keepdims=True), 1e-6)
        swo = oamax / 127.0
        wo = jnp.clip(jnp.round(wof / swo), -127, 127).astype(jnp.int8)
    else:
        wqkv = wqkv.astype(dt)
        swqkv = jnp.ones((3, 1, H), jnp.float32)
        wo = wo.astype(dt)
        swo = jnp.ones((1, H), jnp.float32)

    fuse_ln = ln_scale is not None
    lns = (ln_scale if fuse_ln else jnp.ones((H,))).astype(jnp.float32).reshape(1, H)
    lnb = (ln_bias if fuse_ln else jnp.zeros((H,))).astype(jnp.float32).reshape(1, H)

    kernel = functools.partial(
        _bigbird_block_kernel,
        num_heads=nh,
        head_dim=hd,
        seq_len=L,
        block_size=C,
        n_global_blocks=G,
        n_random=R if nb > 1 else 0,
        sm_scale=float(sm_scale),
        quantized=quantized,
        fuse_ln=fuse_ln,
        eps=float(eps),
    )
    flops = B * (
        2 * 3 * L * H * H
        + nh * L * (3 * C + G * C + R * C) * hd * 4
        + nh * G * C * L * hd * 4
        + 2 * L * H * H
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
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
            transcendentals=B * nh * L * (3 + G + R) * C,
        ),
        interpret=interpret,
    )(
        attention_mask.astype(jnp.int32)[:, None, :],
        jnp.asarray(rand_np, jnp.int32),
        jnp.asarray(rok_np, jnp.int32),
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
