"""PoNet: multi-granularity pooling token mixer (O(N), no attention).

Reimplemented from the PoNet paper's architecture spec (arXiv 2110.02442 —
the reference imports the implementation from ModelScope, which is NOT in the
reference repo; only the wrapper/interface is:
alimeeting4mug/src/models/modeling_ponet.py:34-119, per-token ``segment_ids``
built at ponet_topic_segmentation.py:564-596, values starting at 1 and
incrementing per sentence/paragraph).

Mixer (replaces the self-attention sublayer; block structure, FFN, residuals
and LayerNorms mirror BERT):

  Q, K, V = X Wq, X Wk, X Wv
  GA (global aggregation, two stages):
      g  = masked-mean(Q)                      # (B, d)
      g' = softmax_j(g.K_j / sqrt(d)) V_j      # one-query attention
      G_i = g' * Q_i                           # element-wise cross fusion
  SMP (segment max pooling):
      s_c = max over tokens in the token's segment of (X Ws)
      second-max trick: a token that itself attains the channel max receives
      the segment's second max instead (keeps tokens in a segment distinct)
  LMP (local max pooling):
      l_i = max over a +/- (w//2) window of (X Wl)
  mixer(X)_i = G_i + SMP_i + LMP_i  -> output dense -> dropout -> +X -> LN

TPU notes: SMP uses jax.ops.segment_max vmapped over the batch (scatter-max;
a Pallas kernel is the planned upgrade), LMP is lax.reduce_window, GA is two
tiny matmuls — everything is O(N * d) with static shapes.

Checkpoint conversion: ``hf_convert.ponet_to_encoder_params`` maps the
ModelScope/official PoNet state-dict layout (BERT block naming with five
mixer projections ``attention.self.dense_{q,k,o,segment,local}`` + the
BERT-style ``attention.output.dense/LayerNorm`` and MLP blocks) onto this
trunk; conversion sets ``ponet_ga_per_head=True`` (the official code runs GA
per attention head via transpose_for_scores, scale 1/sqrt(head_size)).

NOTE on fidelity (documented offline-unresolved ambiguities; zero egress, so
the ModelScope source/weights cannot be consulted — resolve by probing a real
checkpoint when network exists):
  1. GA cross-fusion partner: g' is fused elementwise with the q-projection
     (``ponet_ga_fuse="q"``, the paper's formulation); if the checkpoint's
     code fuses with the dense_o/value projection instead, set
     ``ponet_ga_fuse="v"``.
  2. Branch combination is GA + SMP + LMP (paper Fig. 2 summation).
  3. SMP uses the second-max trick (paper's MLM-leakage fix); singleton
     segments fall back to the max.
The structural self-test (tests/test_ponet_convert.py) pins the conversion
mapping against a torch re-implementation of the same documented layout, so
any future fix to 1-3 is a one-flag/one-line change, not a remap.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import (
    ACT2FN,
    Embeddings,
    EncoderOutput,
    QuantDense,
    _DenseParams,
    _LNParams,
)

Array = jax.Array

NEG_INF = -1e9


def segment_max_with_second(x: Array, segment_ids: Array, num_segments: int):
    """Per-segment channelwise (max, second_max) over one sequence.

    x: (L, D); segment_ids: (L,) int32 in [0, num_segments).
    Returns (m1, m2): (num_segments, D).
    """
    m1 = jax.ops.segment_max(x, segment_ids, num_segments=num_segments)
    m1 = jnp.where(jnp.isfinite(m1), m1, NEG_INF)  # empty segments
    x2 = jnp.where(x >= m1[segment_ids], NEG_INF, x)
    m2 = jax.ops.segment_max(x2, segment_ids, num_segments=num_segments)
    m2 = jnp.where(jnp.isfinite(m2), m2, NEG_INF)
    return m1, m2


def smp_second_max(x: Array, segment_ids: Array, num_segments: int) -> Array:
    """Segment max pooling with the second-max trick, one sequence.

    Token i receives its segment's channel max, unless token i itself attains
    that max — then it receives the second max (falling back to the max for
    singleton segments).
    """
    m1, m2 = segment_max_with_second(x, segment_ids, num_segments)
    tok_m1 = m1[segment_ids]  # (L, D)
    tok_m2 = m2[segment_ids]
    # singleton segments / all-equal channels: second max is -inf -> use max
    tok_m2 = jnp.where(tok_m2 <= NEG_INF / 2, tok_m1, tok_m2)
    return jnp.where(x >= tok_m1, tok_m2, tok_m1)


def local_max_pool(x: Array, window: int, mask: Array) -> Array:
    """Sliding-window max over the sequence axis. x: (B, L, D), mask: (B, L)."""
    neg = jnp.where(mask[..., None].astype(bool), x, jnp.asarray(NEG_INF, x.dtype))
    half = window // 2
    # NOTE: the init value must stay a python scalar — an Array init demotes
    # the op to generic reduce_window, which has no reverse-mode autodiff
    return jax.lax.reduce_window(
        neg,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, 1, 1),
        padding=((0, 0), (half, window - 1 - half), (0, 0)),
    )


class PoNetMixer(nn.Module):
    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attention_mask: Array,
        segment_ids: Array,
        deterministic: bool = True,
        fused_ln: Optional[tuple] = None,
    ) -> Array:
        cfg = self.config
        B, L, H = hidden.shape
        # W8A8 projections on the inference path (QuantDense is an nn.Dense
        # param twin; rounding has no gradient so training keeps Dense)
        quant = cfg.quantize == "w8a8" and deterministic

        if fused_ln is not None:
            # one-kernel mixer block (ops/pallas/ponet_block.py): projections,
            # GA, segmented-top-2 SMP, LMP, out proj, residual+LN — all in
            # VMEM. Contract: equal segment ids form contiguous runs (the
            # featurizer's sentence/paragraph ids + trailing pad run).
            from spokennlp_tpu.ops.pallas.ponet_block import (
                fused_ponet_mixer_block,
            )

            ks, bs = [], []
            for name in ("q", "k", "v", "s", "l"):
                kk, bb = _DenseParams(H, H, name=name)()
                ks.append(kk)
                bs.append(bb)
            out_k, out_b = _DenseParams(H, H, name="out")()
            ln_scale, ln_bias = fused_ln
            return fused_ponet_mixer_block(
                hidden,
                attention_mask,
                segment_ids,
                jnp.stack(ks),
                jnp.stack(bs),
                out_k,
                out_b,
                local_window=cfg.ponet_local_window,
                sm_scale=1.0 / float(cfg.head_dim * cfg.num_heads) ** 0.5,
                quantized=quant,
                ln_scale=ln_scale,
                ln_bias=ln_bias,
                eps=cfg.layer_norm_eps,
                interpret=jax.default_backend() == "cpu",
            )

        mk = QuantDense if quant else nn.Dense
        dense = lambda name: mk(H, dtype=self.dtype, name=name)

        q = dense("q")(hidden)
        k = dense("k")(hidden)
        v = dense("v")(hidden)
        s_proj = dense("s")(hidden)
        l_proj = dense("l")(hidden)

        # The pooling chain runs in the COMPUTE dtype: max/compare/select are
        # exact in any float dtype (values pass through unchanged), and the
        # f32 casts of the (B, L, H) tensors were the mixer's measured
        # bottleneck on v5e (7.13 -> 4.16 ms/layer at B=8/L=4096 in bf16).
        # Only the GA reductions accumulate in f32.
        maskc = attention_mask.astype(self.dtype)[..., None]

        # --- GA: masked mean query + one-query attention
        fuse_src = q if cfg.ponet_ga_fuse == "q" else v
        denom = jnp.maximum(
            attention_mask.astype(jnp.float32).sum(axis=1, keepdims=True), 1.0
        )  # (B, 1)
        if cfg.ponet_ga_per_head:
            # official/ModelScope formulation: nh independent one-query
            # attentions over (L, head_dim) slices, scale 1/sqrt(head_dim)
            nh, hd = cfg.num_heads, cfg.head_dim
            qh = q.reshape(B, L, nh, hd)
            kh = k.reshape(B, L, nh, hd)
            vh = v.reshape(B, L, nh, hd)
            gh = (qh * maskc[..., None]).sum(axis=1, dtype=jnp.float32) / denom[
                ..., None
            ]  # (B, nh, hd)
            gh = gh.astype(self.dtype)
            att = jnp.einsum(
                "bnh,blnh->bln", gh, kh, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            att = att + (1.0 - attention_mask.astype(jnp.float32))[..., None] * NEG_INF
            w = jax.nn.softmax(att, axis=1).astype(self.dtype)  # over L
            g_prime = jnp.einsum(
                "bln,blnh->bnh", w, vh, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            ga = (
                g_prime[:, None] * fuse_src.reshape(B, L, nh, hd)
            ).reshape(B, L, H)
        else:
            g = ((q * maskc).sum(axis=1, dtype=jnp.float32) / denom).astype(self.dtype)
            scale = 1.0 / jnp.sqrt(
                jnp.asarray(cfg.head_dim * cfg.num_heads, jnp.float32)
            )
            att = (k * g[:, None, :]).sum(-1, dtype=jnp.float32)  # (B, L)
            att = att * scale + (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
            w = jax.nn.softmax(att, axis=-1).astype(self.dtype)
            g_prime = (
                (w[:, :, None] * v).sum(axis=1, dtype=jnp.float32).astype(self.dtype)
            )  # (B, H)
            ga = g_prime[:, None, :] * fuse_src  # cross fusion

        # --- SMP: per-segment channel max with second-max trick
        # segments are 1-based from the featurizer; pad tokens forced to 0
        seg = jnp.where(attention_mask.astype(bool), segment_ids, 0).astype(jnp.int32)
        num_segments = L + 1

        smp = jax.vmap(lambda xs, ss: smp_second_max(xs, ss, num_segments))(
            s_proj, seg
        )

        # --- LMP: window max
        lmp = local_max_pool(l_proj, cfg.ponet_local_window, attention_mask)

        mixed = ga + smp + lmp
        # fusion break: without it XLA fuses the whole pooling chain
        # (softmax + segment-max scatter + reduce_window) into the out
        # matmul's kOutput fusion, whose scoped-VMEM stack overflows at
        # L=4096/B=8 on v5e (observed 19.46M > 16M -> compile failure)
        mixed = jax.lax.optimization_barrier(mixed)
        out = mk(H, dtype=self.dtype, name="out")(mixed)
        return out


class PoNetLayer(nn.Module):
    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, segment_ids, deterministic=True):
        cfg = self.config
        # "auto" resolves to the XLA mixer: the fused kernel is measured
        # SLOWER at PoNet scale (44.9 vs 97.6 seqs/s at L=4096/B=8) — the
        # segmented scan's dynamic sublane rolls dominate. Kept opt-in
        # ("fused") as a correct, oracle-tested formulation.
        # (the fused kernel implements the single-head GA formulation only)
        use_fused = (
            cfg.ponet_mixer_impl == "fused"
            and deterministic
            and not cfg.ponet_ga_per_head
        )
        if use_fused:
            ln1 = _LNParams(cfg.hidden_size, name="mixer_ln")()
            hidden = PoNetMixer(cfg, dtype=self.dtype, name="mixer")(
                hidden, attention_mask, segment_ids, deterministic, fused_ln=ln1
            )
        else:
            mixed = PoNetMixer(cfg, dtype=self.dtype, name="mixer")(
                hidden, attention_mask, segment_ids, deterministic
            )
            mixed = nn.Dropout(cfg.hidden_dropout)(mixed, deterministic=deterministic)
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mixer_ln"
            )(hidden + mixed)

        if cfg.quantize == "w8a8" and deterministic:
            # same fused MLP half-layer kernel as the dense trunk: the
            # (M, 4H) intermediate never leaves VMEM (param-tree twins)
            from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block

            B, L, H = hidden.shape
            w1, b1 = _DenseParams(H, cfg.intermediate_size, name="mlp_in")()
            w2, b2 = _DenseParams(cfg.intermediate_size, H, name="mlp_out")()
            ln2_scale, ln2_bias = _LNParams(H, name="mlp_ln")()
            out = fused_mlp_block(
                hidden.reshape(B * L, H),
                w1,
                b1,
                w2,
                b2,
                ln2_scale,
                ln2_bias,
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                quantized=True,
                interpret=jax.default_backend() == "cpu",
            )
            return out.reshape(B, L, H)

        mlp = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_in")(hidden)
        mlp = ACT2FN[cfg.hidden_act](mlp)
        mlp = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_out")(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mlp_ln"
        )(hidden + mlp)
        return hidden


class PoNetEncoder(nn.Module):
    """Embeddings + N PoNet layers (+ optional pooler)."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Optional[Array] = None,
        token_type_ids: Optional[Array] = None,
        segment_ids: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
    ) -> EncoderOutput:
        cfg = self.config
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        if segment_ids is None:
            segment_ids = jnp.ones((B, L), jnp.int32)

        hidden = Embeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic
        )
        all_hidden = (hidden,) if output_hidden_states else None
        for i in range(cfg.num_layers):
            hidden = PoNetLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, segment_ids, deterministic
            )
            if output_hidden_states:
                all_hidden = all_hidden + (hidden,)

        pooled = None
        if cfg.add_pooler:
            pooled = nn.tanh(
                nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(hidden[:, 0])
            )
        return EncoderOutput(
            last_hidden_state=hidden, pooled_output=pooled, hidden_states=all_hidden
        )


class PoNetForTokenClassification(nn.Module):
    """PoNet trunk + dropout + linear head (reference wrapper:
    modeling_ponet.py:34-119)."""

    config: EncoderConfig
    num_labels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        segment_ids=None,
        deterministic: bool = True,
    ) -> Dict[str, Array]:
        out = PoNetEncoder(self.config, dtype=self.dtype, name="ponet")(
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            segment_ids=segment_ids,
            deterministic=deterministic,
        )
        seq = nn.Dropout(self.config.hidden_dropout)(
            out.last_hidden_state, deterministic=deterministic
        )
        logits = nn.Dense(self.num_labels, dtype=self.dtype, name="classifier")(seq)
        return {"seq_output": seq, "token_logits": logits}
