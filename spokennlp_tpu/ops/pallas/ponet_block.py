"""Fused PoNet mixer block: 5 projections + GA + SMP + LMP + out projection
(+ residual + LayerNorm) in ONE Pallas kernel per layer.

The reference's PoNet (ModelScope, rebuilt in models/ponet.py from arXiv
2110.02442) mixes tokens with three poolings:
  GA   masked-mean query -> one-query attention over the sequence
  SMP  per-segment channelwise max with the second-max trick
  LMP  sliding-window max
The XLA formulation is elementwise-bound (profiled: the f32/bf16 pooling
chain costs ~4.2 ms/layer at B=8/L=4096 and the (B, L, H) intermediates
round-trip HBM six times per layer). Here everything lives in VMEM:

  grid (B,); per step: x (L, H) @ five (H, H) projections  [MXU, opt. W8A8]
    GA:  two sublane reductions + a (L, 1) softmax          [VPU]
    SMP: segmented TOP-2 scan — forward + backward
         Hillis-Steele passes with a (max, strict-second-max) combine;
         token stats = combine(fwd[i], bwd[i]) (double-counting x_i is
         harmless for this operator), then the second-max trick   [VPU]
    LMP: shifted-slice window max                           [VPU]
    out projection + residual + LayerNorm epilogue          [MXU+VPU]

CONTRACT: equal segment ids form CONTIGUOUS runs (what the featurizers emit
— sentence/paragraph ids in order, padding as a trailing 0-run). The
strict-second-max combine reproduces the reference semantics exactly,
including ties on the max (all entries attaining the max are excluded from
the second max) and the singleton/all-equal fallback to the max.

Oracle: models/ponet.py PoNetMixer + mixer_ln (XLA path), tested in
tests/test_ponet_block.py.

STATUS: correct but OPT-IN (ponet_mixer_impl="fused") — measured SLOWER than
the XLA mixer at PoNet scale (44.9 vs 97.6 seqs/s, L=4096/B=8 on v5e): the
scan's dynamic sublane rolls dominate (and the static-shift variant either
spills >100 MB of registers or takes >40 min to compile). Kept as the
reference implementation of the segmented-scan formulation; the measured
trade-offs are recorded in ROUND1_NOTES.md.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9

from spokennlp_tpu.ops.pallas.int8_matmul import rowquant_in_kernel as _rowquant


def _top2_combine(pm1, pm2, m1, m2):
    """(max, max-of-strictly-less) combine for two multiset summaries."""
    nm1 = jnp.maximum(pm1, m1)
    contrib_p = jnp.where(pm1 < nm1, pm1, pm2)
    contrib_c = jnp.where(m1 < nm1, m1, m2)
    return nm1, jnp.maximum(contrib_p, contrib_c)


def _scan_step(m1, m2, f, s, reverse):
    """One Hillis-Steele step of the segmented top-2 scan (shift = s)."""
    L, H = m1.shape
    fill = jnp.full((s, H), NEG_INF, m1.dtype)
    tfill = jnp.ones((s, 1), jnp.int32)
    if not reverse:  # partner j = i - s
        pm1 = jnp.concatenate([fill, m1[: L - s]], axis=0)
        pm2 = jnp.concatenate([fill, m2[: L - s]], axis=0)
        pf = jnp.concatenate([tfill, f[: L - s]], axis=0)
    else:  # partner j = i + s
        pm1 = jnp.concatenate([m1[s:], fill], axis=0)
        pm2 = jnp.concatenate([m2[s:], fill], axis=0)
        pf = jnp.concatenate([f[s:], tfill], axis=0)
    nm1, nm2 = _top2_combine(pm1, pm2, m1, m2)
    blocked = f > 0
    return (
        jnp.where(blocked, m1, nm1),
        jnp.where(blocked, m2, nm2),
        jnp.maximum(f, pf),
    )


def _segmented_top2(vals, start_flags, reverse: bool):
    """Value-based inclusive segmented top-2 scan (CPU/test form).

    vals: (L, H); start_flags: (L, 1) int32 — nonzero where a segment starts
    (for ``reverse``: where it ENDS). Returns (m1, m2) each (L, H): the
    (max, strict-second-max) of the segment span covered so far. Flags are
    int32, not bool (Mosaic cannot concatenate i1 vectors).
    """
    L = vals.shape[0]
    m1, m2, f = vals, jnp.full_like(vals, NEG_INF), start_flags.astype(jnp.int32)
    for k in range(max(1, math.ceil(math.log2(L)))):
        s = 1 << k
        if s >= L:
            break
        m1, m2, f = _scan_step(m1, m2, f, s, reverse)
    return m1, m2


def _segmented_top2_ref(m1_ref, m2_ref, f_ref, reverse: bool,
                        unrolled: bool = False):
    """Ref-based scan: state round-trips VMEM each step so the compiler
    never holds more than one step's shifted copies live (value form spilled
    166 MB of registers at L=4096).

    On TPU the log2(L) steps run as ONE fori_loop body with a dynamic
    ``pltpu.roll`` (the fully-unrolled concat form compiled for >40 min at
    L=4096 x 6 column tiles). ``unrolled=True`` keeps the static-shift form
    for CPU interpret mode, where pltpu.roll is unavailable."""
    L = m1_ref.shape[0]
    steps = max(1, math.ceil(math.log2(L)))
    if unrolled:
        for k in range(steps):
            s = 1 << k
            if s >= L:
                break
            m1, m2, f = _scan_step(m1_ref[:], m2_ref[:], f_ref[:], s, reverse)
            m1_ref[:], m2_ref[:], f_ref[:] = m1, m2, f
        return

    from jax.experimental.pallas import tpu as pltpu

    ri = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    def body(k, _):
        s = jax.lax.shift_left(1, k)
        m1, m2, f = m1_ref[:], m2_ref[:], f_ref[:]
        if not reverse:  # partner j = i - s: roll down, top s rows are OOB
            oob = ri < s
            pm1 = pltpu.roll(m1, s, 0)
            pm2 = pltpu.roll(m2, s, 0)
            pf = pltpu.roll(f, s, 0)
        else:  # partner j = i + s: roll up, bottom s rows are OOB
            oob = ri >= L - s
            pm1 = pltpu.roll(m1, -s, 0)
            pm2 = pltpu.roll(m2, -s, 0)
            pf = pltpu.roll(f, -s, 0)
        pm1 = jnp.where(oob, NEG_INF, pm1)
        pm2 = jnp.where(oob, NEG_INF, pm2)
        pf = jnp.where(oob, 1, pf)
        nm1, nm2 = _top2_combine(pm1, pm2, m1, m2)
        blocked = f > 0
        m1_ref[:] = jnp.where(blocked, m1, nm1)
        m2_ref[:] = jnp.where(blocked, m2, nm2)
        f_ref[:] = jnp.maximum(f, pf)
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def _ponet_block_kernel(
    mask_ref,  # (1, 1, L) int32
    seg_ref,  # (1, 1, L) int32 (contiguous runs)
    h_ref,  # (1, L, H)
    wp_ref,  # (5, H, H) q/k/v/s/l projections
    swp_ref,  # (5, 1, H)
    bp_ref,  # (5, 1, H)
    wo_ref,  # (H, H)
    swo_ref,  # (1, H)
    bo_ref,  # (1, H)
    lns_ref,  # (1, H)
    lnb_ref,  # (1, H)
    o_ref,  # (1, L, H)
    sa1,  # scratch (L, TC) f32 — segmented-scan working tile
    sa2,  # scratch (L, TC) f32
    sf,  # scratch (L, 1) int32
    *,
    seq_len: int,
    local_window: int,
    sm_scale: float,
    quantized: bool,
    fuse_ln: bool,
    eps: float,
    unrolled: bool,
):
    from jax.experimental import pallas as pl

    L = seq_len
    x = h_ref[0]  # (L, H)
    H = x.shape[1]
    mask = mask_ref[0, 0]  # (L,)
    seg = seg_ref[0, 0]

    if quantized:
        x8, sx = _rowquant(x.astype(jnp.float32), pl)

        def proj(idx):
            return (
                jnp.dot(x8, wp_ref[idx], preferred_element_type=jnp.int32)
                .astype(jnp.float32)
                * sx
                * swp_ref[idx]
                + bp_ref[idx]
            ).astype(x.dtype)

    else:

        def proj(idx):
            return (
                jnp.dot(x, wp_ref[idx], preferred_element_type=jnp.float32)
                + bp_ref[idx]
            ).astype(x.dtype)

    q = proj(0)
    k = proj(1)
    v = proj(2)
    s_proj = proj(3)
    l_proj = proj(4)

    # reshape the 32-bit vector BEFORE comparing: Mosaic only supports
    # minor-dim insertion for 32-bit types (i1 (L,) -> (L,1) is rejected)
    mrow = mask[:, None] > 0  # (L, 1) bool

    # --- GA: masked mean query -> one-query attention ---------------------
    mrow_f = mrow.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mrow_f), 1.0)
    g = (
        jnp.sum(q.astype(jnp.float32) * mrow_f, axis=0, keepdims=True) / denom
    ).astype(x.dtype)  # (1, H)
    att = jnp.sum(
        k.astype(jnp.float32) * g.astype(jnp.float32), axis=1, keepdims=True
    ) * sm_scale + jnp.where(mrow, 0.0, NEG_INF)  # (L, 1)
    am = jnp.max(att)
    p = jnp.exp(att - am)
    w = (p / jnp.sum(p)).astype(x.dtype)  # (L, 1)
    gp = jnp.sum(v.astype(jnp.float32) * w.astype(jnp.float32), axis=0,
                 keepdims=True).astype(x.dtype)  # (1, H)
    ga = gp * q

    # --- SMP: segmented top-2 (contiguous-run contract) -------------------
    # the top-2 combine needs ordered (<) comparisons, which Mosaic only
    # lowers for f32 — run the scan in f32 (values are selections, so the
    # result cast back to the compute dtype is exact)
    sm = jnp.where(mrow, s_proj.astype(jnp.float32), NEG_INF)
    seg2 = seg[:, None]  # (L, 1)
    prev_seg = jnp.concatenate([jnp.full((1, 1), -1, seg.dtype), seg2[:-1]], axis=0)
    next_seg = jnp.concatenate([seg2[1:], jnp.full((1, 1), -1, seg.dtype)], axis=0)
    starts = (seg2 != prev_seg).astype(jnp.int32)  # (L, 1)
    ends = (seg2 != next_seg).astype(jnp.int32)
    # two-phase scan through ONE scratch pair, 128-lane column tiles:
    # (1) forward inclusive scan — at a segment's END it holds the whole
    # segment's top-2; (2) re-seed with those end totals and reverse-scan,
    # which broadcasts each segment's total back to every token (EMPTY is
    # the combine identity). The scan is column-independent; tiling keeps
    # the live state at (L, 128) f32 — the full-width value form spilled
    # >100 MB of registers at L=4096, and the shared scratch serializes
    # tiles so the scheduler cannot re-inflate the live set.
    TC = sa1.shape[1]
    end_rows = ends > 0
    smp_parts = []
    for t in range(H // TC):
        tcol = slice(t * TC, (t + 1) * TC)
        smt = sm[:, tcol]
        sa1[:] = smt
        sa2[:] = jnp.full((L, TC), NEG_INF, jnp.float32)
        sf[:] = starts
        _segmented_top2_ref(sa1, sa2, sf, reverse=False, unrolled=unrolled)
        m1f, m2f = sa1[:], sa2[:]
        sa1[:] = jnp.where(end_rows, m1f, NEG_INF)
        sa2[:] = jnp.where(end_rows, m2f, NEG_INF)
        sf[:] = ends
        _segmented_top2_ref(sa1, sa2, sf, reverse=True, unrolled=unrolled)
        m1, m2 = sa1[:], sa2[:]
        tok_m2 = jnp.where(m2 <= NEG_INF / 2, m1, m2)
        smp_parts.append(jnp.where(smt >= m1, tok_m2, m1).astype(x.dtype))
    smp = jnp.concatenate(smp_parts, axis=1)

    # --- LMP: window max via shifted slices -------------------------------
    lm = jnp.where(mrow, l_proj, jnp.asarray(NEG_INF, x.dtype))
    half = local_window // 2
    lmp = lm
    for off in range(-half, local_window - half):
        if off == 0:
            continue
        fill = jnp.full((abs(off), H), NEG_INF, x.dtype)
        if off < 0:
            sh = jnp.concatenate([fill, lm[:off]], axis=0)
        else:
            sh = jnp.concatenate([lm[off:], fill], axis=0)
        lmp = jnp.maximum(lmp, sh)

    # pad rows carry NEG_INF pooling sentinels — zero them so the residual/LN
    # epilogue (and the next layer's GA mean) stay well-conditioned
    mixed = jnp.where(mrow, ga + smp + lmp, 0.0).astype(jnp.float32)

    # --- out projection + residual + LN epilogue --------------------------
    if quantized:
        c8, sc = _rowquant(mixed, pl)
        out = (
            jnp.dot(c8, wo_ref[:], preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * sc
            * swo_ref[:]
        )
    else:
        out = jnp.dot(
            mixed.astype(x.dtype), wo_ref[:], preferred_element_type=jnp.float32
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
        "local_window",
        "sm_scale",
        "quantized",
        "eps",
        "interpret",
    ),
)
def fused_ponet_mixer_block(
    hidden: Array,  # (B, L, H)
    attention_mask: Array,  # (B, L) int, 1 = real
    segment_ids: Array,  # (B, L) int, contiguous equal-id runs
    proj_kernels: Array,  # (5, H, H) f32: q, k, v, s, l
    proj_biases: Array,  # (5, H)
    out_kernel: Array,  # (H, H)
    out_bias: Array,  # (H,)
    local_window: int,
    sm_scale: float,
    quantized: bool = False,
    ln_scale: Optional[Array] = None,
    ln_bias: Optional[Array] = None,
    eps: float = 1e-12,
    interpret: bool = False,
) -> Array:
    """PoNet mixer block; returns (B, L, H) = LN(x + mixer(x)) when ln_*
    given, else the raw mixer output + residual-less projection."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H = hidden.shape
    assert H % min(H, 128) == 0, H  # column tiles of the SMP scan
    dt = hidden.dtype
    bp = proj_biases.reshape(5, 1, H).astype(jnp.float32)
    if quantized:
        wf = proj_kernels.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-6)
        swp = amax / 127.0  # (5, 1, H)
        wp = jnp.clip(jnp.round(wf / swp), -127, 127).astype(jnp.int8)
        wof = out_kernel.astype(jnp.float32)
        oamax = jnp.maximum(jnp.max(jnp.abs(wof), axis=0, keepdims=True), 1e-6)
        swo = oamax / 127.0
        wo = jnp.clip(jnp.round(wof / swo), -127, 127).astype(jnp.int8)
    else:
        wp = proj_kernels.astype(dt)
        swp = jnp.ones((5, 1, H), jnp.float32)
        wo = out_kernel.astype(dt)
        swo = jnp.ones((1, H), jnp.float32)
    bo = out_bias.reshape(1, H).astype(jnp.float32)

    fuse_ln = ln_scale is not None
    lns = (ln_scale if fuse_ln else jnp.ones((H,))).astype(jnp.float32).reshape(1, H)
    lnb = (ln_bias if fuse_ln else jnp.zeros((H,))).astype(jnp.float32).reshape(1, H)

    kernel = functools.partial(
        _ponet_block_kernel,
        seq_len=L,
        local_window=int(local_window),
        sm_scale=float(sm_scale),
        quantized=quantized,
        fuse_ln=fuse_ln,
        eps=float(eps),
        unrolled=interpret,  # pltpu.roll is TPU-only
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((5, H, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((5, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((5, 1, H), lambda b: (0, 0, 0)),
            pl.BlockSpec((H, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), dt),
        scratch_shapes=[
            pltpu.VMEM((L, min(H, 128)), jnp.float32),
            pltpu.VMEM((L, min(H, 128)), jnp.float32),
            pltpu.VMEM((L, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * 6 * L * H * H),
            bytes_accessed=B * L * H * 4,
            transcendentals=B * L,
        ),
        interpret=interpret,
    )(
        attention_mask.astype(jnp.int32)[:, None, :],
        segment_ids.astype(jnp.int32)[:, None, :],
        hidden,
        wp,
        swp,
        bp,
        wo,
        swo,
        bo,
        lns,
        lnb,
    )
