"""Training-path fused BigBird attention block with a custom VJP.

The reference's fourth topic-seg backbone is BigBird (reference:
emnlp2023-topic_segmentation/src/models/bigbird_for_ts.py, selected at
src/ts_sentence_seq_labeling.py:233-246) and its long-context recipes train
it at seq 2048+ — where autodiff through the XLA gather/bias formulations
saves O(L * K * block) probability residuals per layer per step. This module
completes the training-kernel matrix (dense: train_blocks.py, Longformer:
train_sliding.py):

  forward:  one Pallas kernel per layer — QKV projections, ITC block-sparse
            attention (window slabs / static-prefix global columns /
            SMEM-indexed random blocks under ONE shared-max softmax),
            dense global-row pass with the SAME projections (BigBird ITC
            has no separate global projections), output projection.
            Residual + LN + hidden dropout stay in XLA (same contract as
            train_blocks.py / train_sliding.py).
  backward: flash-style recompute — every score/probability piece is
            regenerated block by block inside the kernel; neither pass
            materializes any (L, K*block) probability tensor in HBM.
            Residuals are the layer inputs only.

Attention-probability dropout runs IN-kernel on the hardware PRNG with
identical reseed + generation order in forward and backward (bit-identical
masks, nothing saved), covering window, global-column, random-block and
global-row probabilities. Grad-parity tests vs the XLA oracle run at rate 0
where the paths coincide.

Semantics contract (enforced by the windowing featurizer): padding is a
SUFFIX. Random-block indices come from the same seeded host-side RNG as the
oracle (ops/bigbird_attention.py:bigbird_block_indices) plus a validity
flag replicating the oracle's first-occurrence dedup — identical attention
pattern to bigbird_block_sparse_attention / bigbird_attention_bias.

Oracle for tests: projections + bigbird_block_sparse_attention + out proj
at dropout 0 (tests/test_train_bigbird.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e9


def _f0(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _dropout_threshold(rate: float) -> int:
    return min(int(rate * 2**32), 2**32 - 1)


def _proj3(x, w_ref, b_ref, idx):
    return (
        jnp.dot(x, w_ref[idx], preferred_element_type=jnp.float32) + b_ref[idx]
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _bigbird_train_fwd_kernel(
    seed_ref,  # (1,) int32 SMEM
    ridx_ref,  # (nb, R) int32 SMEM: random key-block ids per query block
    rok_ref,  # (nb, R) int32 SMEM: 1 = live random block (dedup flag)
    mask_ref,  # (1, 1, L) int32: 1 = valid (suffix padding)
    h_ref,  # (1, L, H) compute dtype
    wqkv_ref,  # (3, H, H)
    bqkv_ref,  # (3, 1, H) f32
    wo_ref,  # (H, H)
    bo_ref,  # (1, H) f32
    o_ref,  # (1, L, H)
    q_s,  # scratch (L, H) dt — pre-scaled q
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
    drop_thr: int,
    keep_prob: float,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, C = seq_len, block_size
    nh, hd = num_heads, head_dim
    H = nh * hd
    nb = L // C
    G = n_global_blocks
    Gk = G * C
    R = n_random

    x = h_ref[0]
    mask2 = mask_ref[0]
    n_valid = jnp.sum((mask2 > 0).astype(jnp.int32))

    q_s[:] = (_proj3(x, wqkv_ref, bqkv_ref, 0) * sm_scale).astype(x.dtype)
    zpad = jnp.zeros((C, H), x.dtype)
    kp_s[0:C, :] = zpad
    kp_s[C : C + L, :] = _proj3(x, wqkv_ref, bqkv_ref, 1).astype(x.dtype)
    kp_s[C + L :, :] = zpad
    vp_s[0:C, :] = zpad
    vp_s[C : C + L, :] = _proj3(x, wqkv_ref, bqkv_ref, 2).astype(x.dtype)
    vp_s[C + L :, :] = zpad

    if drop_thr > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    cj3 = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 1)
    cj1 = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    gj = jax.lax.broadcasted_iota(jnp.int32, (C, Gk), 1)
    gbias = jnp.where(gj < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    gk_all = kp_s[C : C + Gk, :]
    gv_all = vp_s[C : C + Gk, :]

    def chunk_body(i, _):
        r0 = i * C
        key_abs = r0 - C + cj3
        wbias = jnp.where(
            (key_abs >= Gk) & (key_abs < n_valid), 0.0, NEG_INF
        ).astype(jnp.float32)
        qc = q_s[pl.ds(r0, C), :]
        kb = kp_s[pl.ds(r0, 3 * C), :]
        vb = vp_s[pl.ds(r0, 3 * C), :]
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

            sw = dot_qk(kb) + wbias
            sg = dot_qk(gk_all) + gbias
            srs = [dot_qk(rks[r]) + rbias[r] for r in range(R)]
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
                denom = denom + jnp.sum(
                    pr, axis=-1, keepdims=True, dtype=jnp.float32
                )
            if drop_thr > 0:
                bits = pltpu.prng_random_bits((C, 3 * C))
                keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                pw = jnp.where(keep, pw, jnp.zeros_like(pw))
                gbits = pltpu.prng_random_bits((C, Gk))
                gkeep = gbits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                pg = jnp.where(gkeep, pg, jnp.zeros_like(pg))
                prs2 = []
                for pr in prs:
                    rbits = pltpu.prng_random_bits((C, C))
                    rkeep = rbits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                    prs2.append(jnp.where(rkeep, pr, jnp.zeros_like(pr)))
                prs = prs2
                denom = denom * keep_prob

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

    # global-block ROWS: dense attention over all keys, same projections
    if Gk > 0:
        qg = q_s[0:Gk, :]
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
            )
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp((sc - m).astype(x.dtype))
            denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            if drop_thr > 0:
                bits = pltpu.prng_random_bits((Gk, L))
                keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                p = jnp.where(keep, p, jnp.zeros_like(p))
                denom = denom * keep_prob
            cgh = jax.lax.dot_general(
                p.astype(x.dtype), v_all[:, col], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cg_parts.append(cgh / denom)
        ctx_s[0:Gk, :] = jnp.concatenate(cg_parts, axis=1)

    out = (
        jnp.dot(
            ctx_s[:].astype(x.dtype), wo_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:]
    )
    o_ref[0] = out.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bigbird_train_bwd_kernel(
    seed_ref,
    ridx_ref,
    rok_ref,
    mask_ref,
    h_ref,
    wqkv_ref,
    bqkv_ref,
    wo_ref,
    g_ref,  # (1, L, H) upstream cotangent
    dx_ref,  # (1, L, H)
    dwqkv_ref,  # (3, H, H) f32 accumulated over batch grid
    dbqkv_ref,  # (3, 1, H) f32
    dwo_ref,  # (H, H) f32
    dbo_ref,  # (1, H) f32
    q_s,  # (L, H) dt
    kp_s,  # (L + 2C, H) dt
    vp_s,  # (L + 2C, H) dt
    dq_s,  # (L, H) dt — d(q_scaled)
    dk_s,  # (L + 2C, H) f32 — slab-accumulated
    dv_s,  # (L + 2C, H) f32
    ctx_s,  # (L, H) dt — stages the block-sparse-row cotangent (global rows
    #          zeroed) first, then holds the recomputed fwd ctx (for dWo):
    #          chunk i reads its cotangent rows before writing its ctx rows,
    #          so one buffer serves both (same VMEM fold as train_sliding)
    *,
    num_heads: int,
    head_dim: int,
    seq_len: int,
    block_size: int,
    n_global_blocks: int,
    n_random: int,
    sm_scale: float,
    drop_thr: int,
    keep_prob: float,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, C = seq_len, block_size
    nh, hd = num_heads, head_dim
    H = nh * hd
    nb = L // C
    G = n_global_blocks
    Gk = G * C
    R = n_random
    b = pl.program_id(0)

    x = h_ref[0]
    g = g_ref[0]
    mask2 = mask_ref[0]
    n_valid = jnp.sum((mask2 > 0).astype(jnp.int32))

    # recompute projections exactly as fwd
    q_s[:] = (_proj3(x, wqkv_ref, bqkv_ref, 0) * sm_scale).astype(x.dtype)
    zpadd = jnp.zeros((C, H), x.dtype)
    kp_s[0:C, :] = zpadd
    kp_s[C : C + L, :] = _proj3(x, wqkv_ref, bqkv_ref, 1).astype(x.dtype)
    kp_s[C + L :, :] = zpadd
    vp_s[0:C, :] = zpadd
    vp_s[C : C + L, :] = _proj3(x, wqkv_ref, bqkv_ref, 2).astype(x.dtype)
    vp_s[C + L :, :] = zpadd

    dk_s[:] = jnp.zeros((L + 2 * C, H), jnp.float32)
    dv_s[:] = jnp.zeros((L + 2 * C, H), jnp.float32)

    # dctx = g @ Wo^T; global rows take the dense path, the rest the
    # block-sparse path (fwd overwrites ctx rows [0, Gk) — their banded
    # computation is dead, so its cotangent here is zero)
    dctx_full = jax.lax.dot_general(
        g, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, H) f32
    ri = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    # staged through ctx_s: each chunk reads its cotangent rows back with
    # pl.ds before overwriting them with the recomputed ctx
    ctx_s[:] = jnp.where(ri < Gk, 0.0, dctx_full).astype(x.dtype)

    if drop_thr > 0:
        # identical reseed + identical generation ORDER as forward
        pltpu.prng_seed(seed_ref[0], b)

    cj3 = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 1)
    cj1 = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    gj = jax.lax.broadcasted_iota(jnp.int32, (C, Gk), 1)
    gbias = jnp.where(gj < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    gk_all = kp_s[C : C + Gk, :]
    gv_all = vp_s[C : C + Gk, :]

    def chunk_body(i, _):
        r0 = i * C
        key_abs = r0 - C + cj3
        wbias = jnp.where(
            (key_abs >= Gk) & (key_abs < n_valid), 0.0, NEG_INF
        ).astype(jnp.float32)
        qc = q_s[pl.ds(r0, C), :]
        kb = kp_s[pl.ds(r0, 3 * C), :]
        vb = vp_s[pl.ds(r0, 3 * C), :]
        dctx_c = ctx_s[pl.ds(r0, C), :]  # staged cotangent (read before the
        #                                   chunk's ctx write below)
        rks, rvs, rbias = [], [], []
        for r in range(R):
            bidx = ridx_ref[i, r]
            rks.append(kp_s[pl.ds(C + bidx * C, C), :])
            rvs.append(vp_s[pl.ds(C + bidx * C, C), :])
            key_abs_r = bidx * C + cj1
            ok = (rok_ref[i, r] > 0) & (key_abs_r < n_valid)
            rbias.append(jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32))

        ctx_parts, dq_parts = [], []
        dkb_parts, dvb_parts, dgk_parts, dgv_parts = [], [], [], []
        drk_parts = [[] for _ in range(R)]
        drv_parts = [[] for _ in range(R)]
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            qh = qc[:, col]

            def dot_qk(keys):
                return jax.lax.dot_general(
                    qh, keys[:, col], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            sw = dot_qk(kb) + wbias
            sg = dot_qk(gk_all) + gbias
            srs = [dot_qk(rks[r]) + rbias[r] for r in range(R)]
            m = jnp.max(sw, axis=-1, keepdims=True)
            m = jnp.maximum(m, jnp.max(sg, axis=-1, keepdims=True))
            for sr in srs:
                m = jnp.maximum(m, jnp.max(sr, axis=-1, keepdims=True))
            ew = jnp.exp((sw - m).astype(x.dtype))
            eg = jnp.exp((sg - m).astype(x.dtype))
            ers = [jnp.exp((sr - m).astype(x.dtype)) for sr in srs]
            D = (
                jnp.sum(ew, axis=-1, keepdims=True, dtype=jnp.float32)
                + jnp.sum(eg, axis=-1, keepdims=True, dtype=jnp.float32)
            )
            for er in ers:
                D = D + jnp.sum(er, axis=-1, keepdims=True, dtype=jnp.float32)
            if drop_thr > 0:
                bits = pltpu.prng_random_bits((C, 3 * C))
                keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                ew_m = jnp.where(keep, ew, jnp.zeros_like(ew))
                gbits = pltpu.prng_random_bits((C, Gk))
                gkeep = gbits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                eg_m = jnp.where(gkeep, eg, jnp.zeros_like(eg))
                ers_m = []
                for er in ers:
                    rbits = pltpu.prng_random_bits((C, C))
                    rkeep = rbits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                    ers_m.append(jnp.where(rkeep, er, jnp.zeros_like(er)))
                denom_eff = D * keep_prob
            else:
                ew_m, eg_m, ers_m = ew, eg, ers
                denom_eff = D

            dch = dctx_c[:, col]

            def dot_pv(p, vals):
                return jax.lax.dot_general(
                    p.astype(x.dtype), vals[:, col], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            # recompute ctx chunk for dWo (identical op order to fwd)
            ctxh = dot_pv(ew_m, vb) + dot_pv(eg_m, gv_all)
            for r in range(R):
                ctxh = ctxh + dot_pv(ers_m[r], rvs[r])
            ctx_parts.append(ctxh / denom_eff)

            def dot_dp(vals):
                return jax.lax.dot_general(
                    dch, vals[:, col].astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            dpw = dot_dp(vb)  # (C, 3C)
            dpg = dot_dp(gv_all)  # (C, Gk)
            dprs = [dot_dp(rvs[r]) for r in range(R)]  # (C, C) x R

            pw_eff = ew_m.astype(jnp.float32) / denom_eff
            pg_eff = eg_m.astype(jnp.float32) / denom_eff
            prs_eff = [er.astype(jnp.float32) / denom_eff for er in ers_m]
            pw_p = ew.astype(jnp.float32) / D
            pg_p = eg.astype(jnp.float32) / D
            prs_p = [er.astype(jnp.float32) / D for er in ers]

            rs = jnp.sum(dpw * pw_eff, axis=-1, keepdims=True)
            rs = rs + jnp.sum(dpg * pg_eff, axis=-1, keepdims=True)
            for r in range(R):
                rs = rs + jnp.sum(dprs[r] * prs_eff[r], axis=-1, keepdims=True)

            dSw = (pw_eff * dpw - pw_p * rs).astype(x.dtype)  # (C, 3C)
            dSg = (pg_eff * dpg - pg_p * rs).astype(x.dtype)  # (C, Gk)
            dSrs = [
                (prs_eff[r] * dprs[r] - prs_p[r] * rs).astype(x.dtype)
                for r in range(R)
            ]

            def dot_sk(dS, keys):
                return jax.lax.dot_general(
                    dS, keys[:, col], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            dq_h = dot_sk(dSw, kb) + dot_sk(dSg, gk_all)
            for r in range(R):
                dq_h = dq_h + dot_sk(dSrs[r], rks[r])
            dq_parts.append(dq_h)

            def dot_sq(dS):  # (n, C)^T contraction over query rows
                return jax.lax.dot_general(
                    dS, qh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def dot_pd(p_eff):
                return jax.lax.dot_general(
                    p_eff.astype(x.dtype), dch.astype(x.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            dkb_parts.append(dot_sq(dSw))  # (3C, hd)
            dvb_parts.append(dot_pd(pw_eff))
            dgk_parts.append(dot_sq(dSg))  # (Gk, hd)
            dgv_parts.append(dot_pd(pg_eff))
            for r in range(R):
                drk_parts[r].append(dot_sq(dSrs[r]))  # (C, hd)
                drv_parts[r].append(dot_pd(prs_eff[r]))

        ctx_s[pl.ds(r0, C), :] = jnp.concatenate(ctx_parts, axis=1).astype(
            x.dtype
        )
        dq_s[pl.ds(r0, C), :] = jnp.concatenate(dq_parts, axis=1).astype(
            x.dtype
        )
        dk_s[pl.ds(r0, 3 * C), :] += jnp.concatenate(dkb_parts, axis=1)
        dv_s[pl.ds(r0, 3 * C), :] += jnp.concatenate(dvb_parts, axis=1)
        if Gk > 0:
            dk_s[pl.ds(C, Gk), :] += jnp.concatenate(dgk_parts, axis=1)
            dv_s[pl.ds(C, Gk), :] += jnp.concatenate(dgv_parts, axis=1)
        for r in range(R):
            bidx = ridx_ref[i, r]
            dk_s[pl.ds(C + bidx * C, C), :] += jnp.concatenate(
                drk_parts[r], axis=1
            )
            dv_s[pl.ds(C + bidx * C, C), :] += jnp.concatenate(
                drv_parts[r], axis=1
            )
        return 0

    jax.lax.fori_loop(0, nb, chunk_body, 0)

    # ---- global rows: recompute + backward (same projections) -------------
    if Gk > 0:
        qg = q_s[0:Gk, :]
        k_all = kp_s[C : C + L, :]
        v_all = vp_s[C : C + L, :]
        li = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        key_bias = jnp.where(li < n_valid, 0.0, NEG_INF).astype(jnp.float32)
        dctx_g = dctx_full[0:Gk].astype(x.dtype)

        cg_parts, dqg_parts, dkg_parts, dvg_parts = [], [], [], []
        for h in range(nh):
            col = slice(h * hd, (h + 1) * hd)
            qgh, kgh, vgh = qg[:, col], k_all[:, col], v_all[:, col]
            sc = (
                jax.lax.dot_general(
                    qgh, kgh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + key_bias
            )
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp((sc - m).astype(x.dtype))
            D = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            if drop_thr > 0:
                bits = pltpu.prng_random_bits((Gk, L))
                keep = bits.astype(jnp.uint32) >= jnp.uint32(drop_thr)
                e_m = jnp.where(keep, e, jnp.zeros_like(e))
                denom_eff = D * keep_prob
            else:
                e_m = e
                denom_eff = D
            dch = dctx_g[:, col]
            cgh = (
                jax.lax.dot_general(
                    e_m.astype(x.dtype), vgh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                / denom_eff
            )
            cg_parts.append(cgh)
            dp = jax.lax.dot_general(
                dch, vgh.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Gk, L)
            p_eff = e_m.astype(jnp.float32) / denom_eff
            p = e.astype(jnp.float32) / D
            rs = jnp.sum(dp * p_eff, axis=-1, keepdims=True)
            dS = (p_eff * dp - p * rs).astype(x.dtype)  # (Gk, L)
            dqg_parts.append(
                jax.lax.dot_general(
                    dS, kgh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            dkg_parts.append(
                jax.lax.dot_general(
                    dS, qgh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (L, hd)
            dvg_parts.append(
                jax.lax.dot_general(
                    p_eff.astype(x.dtype), dch.astype(x.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (L, hd)
        ctx_s[0:Gk, :] = jnp.concatenate(cg_parts, axis=1).astype(x.dtype)
        # same q projection feeds both passes: add the dense rows' dq
        dq_s[0:Gk, :] = dq_s[0:Gk, :] + jnp.concatenate(
            dqg_parts, axis=1
        ).astype(x.dtype)
        dk_s[pl.ds(C, L), :] += jnp.concatenate(dkg_parts, axis=1)
        dv_s[pl.ds(C, L), :] += jnp.concatenate(dvg_parts, axis=1)

    # ---- assemble dx and weight grads --------------------------------------
    dq_us = (dq_s[:].astype(jnp.float32) * sm_scale).astype(x.dtype)  # (L, H)
    dk_us = dk_s[pl.ds(C, L), :].astype(x.dtype)
    dv_us = dv_s[pl.ds(C, L), :].astype(x.dtype)

    def back(d, idx):
        return jax.lax.dot_general(
            d, wqkv_ref[idx], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dx = back(dq_us, 0) + back(dk_us, 1) + back(dv_us, 2)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    def wgrad(lhs, rhs):  # (L, H)^T (L, H) -> (H, H) f32
        return jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dwq = wgrad(x, dq_us)
    dwk = wgrad(x, dk_us)
    dwv = wgrad(x, dv_us)
    dbq = jnp.sum(dq_us.astype(jnp.float32), axis=0, keepdims=True)
    dbk = jnp.sum(dk_us.astype(jnp.float32), axis=0, keepdims=True)
    dbv = jnp.sum(dv_us.astype(jnp.float32), axis=0, keepdims=True)
    dwo = jax.lax.dot_general(
        ctx_s[:].astype(x.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
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


# ---------------------------------------------------------------------------
# custom-VJP builder + public wrapper
# ---------------------------------------------------------------------------


def _specs(L, H):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # ridx (nb, R)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # rok (nb, R)
        pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),  # mask
        pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),  # hidden
        pl.BlockSpec((3, H, H), lambda b: (0, 0, 0)),  # wqkv
        pl.BlockSpec((3, 1, H), lambda b: (0, 0, 0)),  # bqkv
    ]


@functools.lru_cache(maxsize=None)
def make_bigbird_attention_train(
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    block_size: int,
    n_global_blocks: int,
    n_random: int,
    rate: float,
    interpret: bool,
):
    """Build the custom-VJP fused BigBird training attention.

    Primals: (hidden (B,L,H) dt, mask (B,L) int32, ridx (nb,R) int32,
    rok (nb,R) int32, seed (1,) int32, wqkv (3,H,H) f32, bqkv (3,1,H) f32,
    wo (H,H) f32, bo (1,H) f32) -> (B, L, H) attention output BEFORE hidden
    dropout / residual / LN.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    thr = _dropout_threshold(rate) if rate > 0.0 else 0
    keep_prob = 1.0 - rate
    C = block_size
    G = n_global_blocks
    R = n_random

    def _kernel_kwargs(L):
        return dict(
            num_heads=num_heads,
            head_dim=head_dim,
            seq_len=L,
            block_size=C,
            n_global_blocks=G,
            n_random=R,
            sm_scale=sm_scale,
            drop_thr=thr,
            keep_prob=keep_prob,
        )

    def fwd_call(hidden, mask, ridx, rok, seed, wqkv, bqkv, wo, bo):
        B, L, H = hidden.shape
        dt = hidden.dtype
        nh, hd = num_heads, head_dim
        kernel = functools.partial(
            _bigbird_train_fwd_kernel, **_kernel_kwargs(L)
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
            in_specs=_specs(L, H)
            + [
                pl.BlockSpec((H, H), lambda b: (0, 0)),  # wo
                pl.BlockSpec((1, H), lambda b: (0, 0)),  # bo
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
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=2 * B * L * H * 2,
                transcendentals=B * nh * L * (3 + G + R) * C,
            ),
            interpret=interpret,
        )(
            seed,
            ridx,
            rok,
            mask.astype(jnp.int32)[:, None, :],
            hidden,
            wqkv.astype(dt),
            bqkv.astype(jnp.float32),
            wo.astype(dt),
            bo.astype(jnp.float32),
        )

    @jax.custom_vjp
    def attn(hidden, mask, ridx, rok, seed, wqkv, bqkv, wo, bo):
        return fwd_call(hidden, mask, ridx, rok, seed, wqkv, bqkv, wo, bo)

    def attn_fwd(hidden, mask, ridx, rok, seed, wqkv, bqkv, wo, bo):
        out = fwd_call(hidden, mask, ridx, rok, seed, wqkv, bqkv, wo, bo)
        return out, (hidden, mask, ridx, rok, seed, wqkv, bqkv, wo)

    def attn_bwd(res, g):
        hidden, mask, ridx, rok, seed, wqkv, bqkv, wo = res
        B, L, H = hidden.shape
        dt = hidden.dtype
        nh, hd = num_heads, head_dim
        kernel = functools.partial(
            _bigbird_train_bwd_kernel, **_kernel_kwargs(L)
        )
        acc3 = lambda b: (0, 0, 0)
        flops = 3 * B * (
            2 * 3 * L * H * H
            + nh * L * (3 * C + G * C + R * C) * hd * 4
            + nh * G * C * L * hd * 4
            + 2 * L * H * H
        )
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=_specs(L, H)
            + [
                pl.BlockSpec((H, H), lambda b: (0, 0)),  # wo
                pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),  # g
            ],
            out_specs=[
                pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
                pl.BlockSpec((3, H, H), acc3),
                pl.BlockSpec((3, 1, H), acc3),
                pl.BlockSpec((H, H), lambda b: (0, 0)),
                pl.BlockSpec((1, H), lambda b: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, L, H), dt),
                jax.ShapeDtypeStruct((3, H, H), jnp.float32),
                jax.ShapeDtypeStruct((3, 1, H), jnp.float32),
                jax.ShapeDtypeStruct((H, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((L, H), dt),
                pltpu.VMEM((L + 2 * C, H), dt),
                pltpu.VMEM((L + 2 * C, H), dt),
                pltpu.VMEM((L, H), dt),  # dq
                pltpu.VMEM((L + 2 * C, H), jnp.float32),  # dk accumulator
                pltpu.VMEM((L + 2 * C, H), jnp.float32),  # dv accumulator
                pltpu.VMEM((L, H), dt),  # staged cotangent, then ctx
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * B * L * H * 2,
                transcendentals=2 * B * nh * L * (3 + G + R) * C,
            ),
            interpret=interpret,
        )(
            seed,
            ridx,
            rok,
            mask.astype(jnp.int32)[:, None, :],
            hidden,
            wqkv.astype(dt),
            bqkv.astype(jnp.float32),
            wo.astype(dt),
            g.astype(dt),
        )
        dx, dwqkv, dbqkv, dwo, dbo = outs
        return (dx, _f0(mask), _f0(ridx), _f0(rok), _f0(seed), dwqkv, dbqkv,
                dwo, dbo)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def bigbird_attention_block_train(
    hidden: Array,  # (B, L, H) compute dtype
    attention_mask: Array,  # (B, L) int; suffix-padding contract
    qkv_kernel: Array,  # (H, 3, nh, hd) f32 param (raw layout)
    qkv_bias: Array,  # (3, nh, hd)
    out_kernel: Array,  # (nh, hd, H)
    out_bias: Array,  # (H,)
    seed: Array,  # (1,) int32 dropout stream seed
    sm_scale: float,
    block_size: int,
    num_global_blocks: int,
    num_random_blocks: int,
    pattern_seed: int,
    dropout_rate: float = 0.0,
    interpret: bool = False,
) -> Array:
    """Differentiable fused BigBird attention block (TRAINING path).

    Constraints: L % block_size == 0 and block_size % 8 == 0; padding is a
    suffix. The random pattern is the oracle's
    (ops/bigbird_attention.py:bigbird_block_indices at ``pattern_seed``),
    with the first-occurrence dedup replicated as a validity flag.
    """
    from spokennlp_tpu.ops.bigbird_attention import bigbird_block_indices

    H, three, nh, hd = qkv_kernel.shape
    assert three == 3
    B, L, _ = hidden.shape
    C = block_size
    assert L % C == 0 and C % 8 == 0, (L, C)
    nb = L // C
    G = min(num_global_blocks, nb)
    R = num_random_blocks if nb > 1 else 0

    idx_np = bigbird_block_indices(nb, G, num_random_blocks, pattern_seed)
    if R > 0:
        rand_np = idx_np[:, G + 3 :]
        rok_np = np.ones_like(rand_np)
    else:
        # zero-width SMEM inputs break block-shape padding; the kernel
        # never reads the table when n_random == 0
        rand_np = np.zeros((nb, 1), np.int32)
        rok_np = np.zeros((nb, 1), np.int32)
    for i in range(nb):
        seen = set(int(blk) for blk in idx_np[i, : G + 3])
        for r in range(rand_np.shape[1]):
            blk = int(rand_np[i, r])
            if blk in seen:  # padded-self fallback (short sequences)
                rok_np[i, r] = 0
            seen.add(blk)

    wqkv = qkv_kernel.transpose(1, 0, 2, 3).reshape(3, H, H)
    bqkv = qkv_bias.reshape(3, 1, H)
    wo = out_kernel.reshape(H, H)
    bo = out_bias.reshape(1, H)
    fn = make_bigbird_attention_train(
        nh, hd, float(sm_scale), int(C), int(G), int(R),
        float(dropout_rate), bool(interpret),
    )
    return fn(
        hidden, attention_mask, jnp.asarray(rand_np, jnp.int32),
        jnp.asarray(rok_np, jnp.int32), seed.astype(jnp.int32),
        wqkv, bqkv, wo, bo,
    )
