"""Shared transformer encoder trunk (Flax Linen), TPU-first.

One trunk serves most of the reference's encoder zoo — BERT, ELECTRA,
StructBERT (dense attention) and Longformer (sliding-window + global
attention) — selected by ``EncoderConfig.attention_type``. PoNet's pooling
mixer lives in its own module (models/ponet.py); the trunk raises for
``attention_type="ponet"``. The reference instead wraps seven separate
HF/ModelScope model classes
(reference: emnlp2023-topic_segmentation/src/models/*.py:19-120,
alimeeting4mug/src/models/modeling_ponet.py:34-119).

TPU design notes:
  - fused QKV projection: one (H, 3H) matmul feeds the MXU instead of three
    (H, H) matmuls.
  - compute dtype is configurable (bfloat16 by default in training); params
    stay float32.
  - static shapes everywhere; attention masks are additive biases so XLA can
    fuse them into the softmax.
  - layers are unrolled Python loops (12-24 layers) — XLA pipelines them; no
    data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.ops.flash_attention import flash_available, flash_self_attention
from spokennlp_tpu.ops.sliding_attention import sliding_window_attention_mask_bias

Array = jax.Array

ACT2FN = {
    # HF semantics: "gelu" is the exact erf form (transformers ACT2FN);
    # flax's nn.gelu defaults to the tanh approximation, so be explicit —
    # the fused MLP kernel (ops/pallas/mlp_block.py) also uses exact gelu
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "relu": nn.relu,
    "silu": nn.silu,
}

NEG_INF = -1e9  # large-negative additive mask; safe in bf16/fp32 softmax


@dataclasses.dataclass
class EncoderOutput:
    last_hidden_state: Array  # (B, L, H)
    pooled_output: Optional[Array] = None  # (B, H) tanh(W @ h_cls)
    hidden_states: Optional[tuple] = None  # per-layer (B, L, H), incl. embeddings
    attentions: Optional[tuple] = None  # per-layer (B, nh, L, L) probs (dense only)


class Embeddings(nn.Module):
    """Word + absolute-position + token-type embeddings, LayerNorm, dropout."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        token_type_ids: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        B, L = input_ids.shape
        E = cfg.embedding_size or cfg.hidden_size
        word_emb = nn.Embed(
            cfg.vocab_size, E, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        if position_ids is None:
            if cfg.position_style == "roberta":
                # RoBERTa/Longformer: ids count non-pad tokens, offset past pad
                not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
                position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id
            else:
                position_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        pos_emb = nn.Embed(
            cfg.max_position_embeddings,
            E,
            dtype=self.dtype,
            name="position_embeddings",
        )(position_ids)
        x = word_emb + pos_emb
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + nn.Embed(
                cfg.type_vocab_size,
                E,
                dtype=self.dtype,
                name="token_type_embeddings",
            )(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        if E != cfg.hidden_size:
            # ELECTRA-style projection to the trunk width
            x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="embeddings_project")(x)
        return x


class FusedQKV(nn.Module):
    """Fused QKV projection with selectable output layout.

    kernel (H, 3, nh, hd), bias (3, nh, hd) — identical param tree to the
    DenseGeneral it replaces, but able to emit (B, 3, nh, L, hd) directly for
    the Pallas kernel (XLA folds the transpose into the matmul epilogue;
    measured free on v5e, unlike a separate transpose pass).

    With ``quantize=True`` the projection runs on the W8A8 Pallas path
    (ops/pallas/int8_matmul.py): the (H, 3*nh*hd) matmul in int8 with a
    fused dequant epilogue; param tree unchanged.
    """

    num_heads: int
    head_dim: int
    dtype: Any = jnp.float32
    quantize: bool = False

    @nn.compact
    def __call__(self, hidden: Array, layout: str = "blsnd") -> Array:
        H = hidden.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(
                in_axis=0, out_axis=(2, 3), batch_axis=(1,)
            ),
            (H, 3, self.num_heads, self.head_dim),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (3, self.num_heads, self.head_dim)
        )
        if layout == "raw":  # fused attention block consumes the params directly
            return kernel, bias
        if self.quantize and layout == "blsnd":
            from spokennlp_tpu.ops.pallas.int8_matmul import quant_dense

            B, L, _ = hidden.shape
            out = quant_dense(
                hidden.reshape(B * L, H),
                kernel.reshape(H, 3 * self.num_heads * self.head_dim),
                bias.reshape(-1),
                out_dtype=self.dtype,
            )
            return out.reshape(B, L, 3, self.num_heads, self.head_dim)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if layout == "blsnd":
            return jnp.einsum("blh,hsnd->blsnd", hidden, kernel) + bias
        if layout == "bsnld":
            return (
                jnp.einsum("blh,hsnd->bsnld", hidden, kernel)
                + bias[None, :, :, None, :]
            )
        raise ValueError(layout)


class AttnOutProj(nn.Module):
    """Output projection consuming (B, L, nh, hd) or (B, nh, L, hd).

    kernel (nh, hd, H), bias (H,) — same param tree as DenseGeneral(axis=(-2,-1)).
    """

    features: int
    dtype: Any = jnp.float32
    quantize: bool = False
    # set when called with layout="raw" (param shapes not derivable from ctx)
    num_heads: Optional[int] = None
    head_dim: Optional[int] = None

    @nn.compact
    def __call__(self, ctx: Array, layout: str = "blnd") -> Array:
        if layout == "raw":
            nh, hd = self.num_heads, self.head_dim
        elif layout == "blnd":
            nh, hd = ctx.shape[-2], ctx.shape[-1]
        else:
            nh, hd = ctx.shape[1], ctx.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (nh, hd, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if layout == "raw":
            return kernel, bias
        if self.quantize and layout == "blnd":
            from spokennlp_tpu.ops.pallas.int8_matmul import quant_dense

            B, L, _, _ = ctx.shape
            out = quant_dense(
                ctx.reshape(B * L, nh * hd),
                kernel.reshape(nh * hd, self.features),
                bias,
                out_dtype=self.dtype,
            )
            return out.reshape(B, L, self.features)
        kernel = kernel.astype(self.dtype)
        if layout == "blnd":
            return jnp.einsum("blnd,ndh->blh", ctx, kernel) + bias.astype(self.dtype)
        if layout == "bnld":
            return jnp.einsum("bnld,ndh->blh", ctx, kernel) + bias.astype(self.dtype)
        raise ValueError(layout)


class _LNParams(nn.Module):
    """Param twin of nn.LayerNorm (scale/bias) for fused-kernel epilogues —
    the arrays are consumed by Pallas kernels instead of an nn call, but the
    checkpoint tree stays identical."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Param twin of nn.Dense (kernel/bias) for fused-kernel consumption."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class QuantDense(nn.Module):
    """nn.Dense twin (identical param tree) on the W8A8 Pallas path.

    ``activation`` runs fused in the kernel epilogue (an unfused GELU between
    two pallas calls costs an (M, 4H) HBM round-trip, ~1.2 ms/layer)."""

    features: int
    dtype: Any = jnp.float32
    activation: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from spokennlp_tpu.ops.pallas.int8_matmul import quant_dense

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        lead = x.shape[:-1]
        out = quant_dense(
            x.reshape(-1, x.shape[-1]),
            kernel,
            bias,
            out_dtype=self.dtype,
            activation=self.activation,
        )
        return out.reshape(*lead, self.features)


class SelfAttention(nn.Module):
    """Multi-head self-attention with a fused QKV projection.

    ``attention_bias`` is an additive float mask broadcastable to
    (B, num_heads, L, L); padding and window structure are both expressed this
    way so one einsum path serves dense and (small-L) sliding-window variants.
    """

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attention_bias: Optional[Array],
        deterministic: bool = True,
        output_attentions: bool = False,
        flash_segment_ids: Optional[Array] = None,
        use_flash: bool = False,
        global_mask: Optional[Array] = None,
        key_padding_bias: Optional[Array] = None,
        raw_attention_mask: Optional[Array] = None,
        attention_impl: Optional[str] = None,
        fused_ln: Optional[tuple] = None,
        collect_raw: bool = False,
        sliding_fused: bool = False,
        sliding_global_rows: bool = True,
        bigbird_fused: bool = False,
    ):
        cfg = self.config
        impl = attention_impl or cfg.attention_impl
        B, L, H = hidden.shape
        nh, hd = cfg.num_heads, cfg.head_dim

        # W8A8 only on the inference path: rounding has no gradient
        quant = cfg.quantize == "w8a8" and deterministic
        qkv_proj = FusedQKV(nh, hd, dtype=self.dtype, quantize=quant, name="qkv")
        if collect_raw:
            # whole-stack megakernel path: hand the raw projection params to
            # the caller (ops/pallas/stack_block.py consumes them directly)
            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            return (qkv_kernel, qkv_bias, out_kernel, out_bias), None
        out_layout = "blnd"
        sliding_chunked = (
            cfg.attention_type == "sliding_window" and raw_attention_mask is not None
        )

        probs = None
        if (
            impl == "train_fused"
            and cfg.attention_type == "dense"
            and flash_segment_ids is not None
        ):
            # TRAINING-path fused attention block with a custom VJP: the
            # backward recomputes attention flash-style, so the (nh, L, L)
            # probability tensors are never materialized in HBM in either
            # pass; attention-prob dropout runs on the in-kernel hardware
            # PRNG (ops/pallas/train_blocks.py)
            from spokennlp_tpu.ops.pallas.train_blocks import (
                attention_block_train,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            rate = float(cfg.attention_dropout) if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            return (
                attention_block_train(
                    hidden,
                    flash_segment_ids,
                    qkv_kernel,
                    qkv_bias,
                    out_kernel,
                    out_bias,
                    seed,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    dropout_rate=rate,
                    interpret=jax.default_backend() == "cpu",
                ),
                None,
            )
        if (
            impl == "train_fused"
            and cfg.attention_type == "sliding_window"
            and raw_attention_mask is not None
            and global_mask is not None
        ):
            # TRAINING fused Longformer block with a custom VJP: banded
            # scores/probs recomputed flash-style in the backward kernel —
            # neither pass materializes an (L, 3C) band in HBM
            # (ops/pallas/train_sliding.py; contract: suffix padding, prefix
            # globals)
            from spokennlp_tpu.ops.pallas.train_sliding import (
                sliding_attention_block_train,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            gqkv_kernel, gqkv_bias = FusedQKV(
                nh, hd, dtype=self.dtype, name="qkv_global"
            )(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            rate = float(cfg.attention_dropout) if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            return (
                sliding_attention_block_train(
                    hidden,
                    raw_attention_mask,
                    global_mask,
                    qkv_kernel,
                    qkv_bias,
                    gqkv_kernel,
                    gqkv_bias,
                    out_kernel,
                    out_bias,
                    seed,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    window=cfg.attention_window,
                    max_globals=cfg.max_global_tokens,
                    dropout_rate=rate,
                    global_rows=sliding_global_rows,
                    interpret=jax.default_backend() == "cpu",
                ),
                None,
            )
        if (
            impl == "train_fused"
            and cfg.attention_type == "bigbird"
            and raw_attention_mask is not None
        ):
            # TRAINING fused BigBird block with a custom VJP: every
            # score/probability piece recomputed flash-style in the backward
            # kernel (ops/pallas/train_bigbird.py; contract: suffix padding)
            from spokennlp_tpu.ops.pallas.train_bigbird import (
                bigbird_attention_block_train,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            rate = float(cfg.attention_dropout) if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            return (
                bigbird_attention_block_train(
                    hidden,
                    raw_attention_mask,
                    qkv_kernel,
                    qkv_bias,
                    out_kernel,
                    out_bias,
                    seed,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    block_size=cfg.bigbird_block_size,
                    num_global_blocks=cfg.bigbird_num_global_blocks,
                    num_random_blocks=cfg.bigbird_num_random_blocks,
                    pattern_seed=cfg.bigbird_seed,
                    dropout_rate=rate,
                    interpret=jax.default_backend() == "cpu",
                ),
                None,
            )
        if (
            impl == "fused"
            and cfg.attention_type == "dense"
            and flash_segment_ids is not None
            and deterministic  # no dropout / no VJP in the fused kernel
        ):
            # one-kernel attention block: qkv proj + MHA + out proj fused,
            # q/k/v never leave VMEM (ops/pallas/attention_block.py)
            from spokennlp_tpu.ops.pallas.attention_block import (
                fused_attention_block,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            out_mod = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )
            out_kernel, out_bias = out_mod(hidden, layout="raw")
            interpret = jax.default_backend() == "cpu"
            ln_scale, ln_bias = fused_ln if fused_ln is not None else (None, None)
            return (
                fused_attention_block(
                    hidden,
                    flash_segment_ids,
                    qkv_kernel,
                    qkv_bias,
                    out_kernel,
                    out_bias,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    interpret=interpret,
                    quantized=quant,
                    ln_scale=ln_scale,
                    ln_bias=ln_bias,
                    eps=cfg.layer_norm_eps,
                ),
                None,
            )
        if sliding_fused:
            # one-kernel Longformer block: local+global QKV projections,
            # banded attention, global rows, out proj, residual+LN epilogue
            # (ops/pallas/sliding_block.py; contract: suffix padding, prefix
            # globals — guaranteed by the windowing featurizer + CLS mask)
            from spokennlp_tpu.ops.pallas.sliding_block import (
                fused_sliding_attention_block,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            gqkv_kernel, gqkv_bias = FusedQKV(
                nh, hd, dtype=self.dtype, name="qkv_global"
            )(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            ln_scale, ln_bias = fused_ln if fused_ln is not None else (None, None)
            return (
                fused_sliding_attention_block(
                    hidden,
                    raw_attention_mask,
                    global_mask,
                    qkv_kernel,
                    qkv_bias,
                    gqkv_kernel,
                    gqkv_bias,
                    out_kernel,
                    out_bias,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    window=cfg.attention_window,
                    max_globals=cfg.max_global_tokens,
                    quantized=quant,
                    ln_scale=ln_scale,
                    ln_bias=ln_bias,
                    eps=cfg.layer_norm_eps,
                    interpret=jax.default_backend() == "cpu",
                    global_rows=sliding_global_rows,
                ),
                None,
            )
        if bigbird_fused:
            # one-kernel BigBird block (ops/pallas/bigbird_block_kernel.py;
            # contract: suffix padding — the featurizers right-pad)
            from spokennlp_tpu.ops.pallas.bigbird_block_kernel import (
                fused_bigbird_attention_block,
            )

            qkv_kernel, qkv_bias = qkv_proj(hidden, layout="raw")
            out_kernel, out_bias = AttnOutProj(
                H, dtype=self.dtype, num_heads=nh, head_dim=hd, name="out"
            )(hidden, layout="raw")
            ln_scale, ln_bias = fused_ln if fused_ln is not None else (None, None)
            return (
                fused_bigbird_attention_block(
                    hidden,
                    raw_attention_mask,
                    qkv_kernel,
                    qkv_bias,
                    out_kernel,
                    out_bias,
                    block_size=cfg.bigbird_block_size,
                    num_global_blocks=cfg.bigbird_num_global_blocks,
                    num_random_blocks=cfg.bigbird_num_random_blocks,
                    seed=cfg.bigbird_seed,
                    sm_scale=1.0 / float(hd) ** 0.5,
                    quantized=quant,
                    ln_scale=ln_scale,
                    ln_bias=ln_bias,
                    eps=cfg.layer_norm_eps,
                    interpret=jax.default_backend() == "cpu",
                ),
                None,
            )
        if cfg.attention_type == "bigbird" and raw_attention_mask is not None:
            # block-sparse gather path (ops/bigbird_attention.py); the bias
            # path is handled by the dense einsum branch below
            from spokennlp_tpu.ops.bigbird_attention import (
                bigbird_block_sparse_attention,
            )

            qkv = qkv_proj(hidden)
            qq, kk, vv = jnp.moveaxis(qkv, 2, 0)
            ctx = bigbird_block_sparse_attention(
                qq,
                kk,
                vv,
                raw_attention_mask,
                cfg.bigbird_block_size,
                cfg.bigbird_num_global_blocks,
                cfg.bigbird_num_random_blocks,
                cfg.bigbird_seed,
                softmax_dtype=(
                    self.dtype if cfg.softmax_in_compute_dtype else jnp.float32
                ),
            ).astype(self.dtype)
        elif sliding_chunked:
            from spokennlp_tpu.ops.sliding_attention import (
                chunked_sliding_window_attention,
            )

            qkv = qkv_proj(hidden)
            q, k, v = jnp.moveaxis(qkv, 2, 0)
            ctx = chunked_sliding_window_attention(
                q,
                k,
                v,
                raw_attention_mask,
                global_mask,
                cfg.attention_window,
                max_globals=cfg.max_global_tokens,
                softmax_dtype=(
                    self.dtype if cfg.softmax_in_compute_dtype else jnp.float32
                ),
            ).astype(self.dtype)
        elif impl == "pallas" and flash_segment_ids is not None:
            from spokennlp_tpu.ops.pallas.blhd_attention import snld_self_attention

            qkv = qkv_proj(hidden, layout="bsnld")  # (B, 3, nh, L, hd)
            interpret = jax.default_backend() == "cpu"
            ctx = snld_self_attention(
                qkv,
                flash_segment_ids,
                sm_scale=1.0 / float(hd) ** 0.5,
                interpret=interpret,
            )  # (B, nh, L, hd)
            out_layout = "bnld"
        elif use_flash:
            qkv = qkv_proj(hidden)  # (B, L, 3, nh, hd)
            q, k, v = jnp.moveaxis(qkv, 2, 0)
            ctx = flash_self_attention(
                q, k, v, flash_segment_ids, sm_scale=1.0 / float(hd) ** 0.5
            )
        else:
            qkv = qkv_proj(hidden)
            q, k, v = jnp.moveaxis(qkv, 2, 0)
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, dtype=self.dtype))
            # (B, nh, L, L)
            scores = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)
            if attention_bias is not None:
                scores = scores + attention_bias.astype(scores.dtype)
            sm_dtype = self.dtype if cfg.softmax_in_compute_dtype else jnp.float32
            probs = jax.nn.softmax(scores.astype(sm_dtype), axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v)

        if cfg.attention_type == "sliding_window" and global_mask is not None:
            # Longformer global pass: global-position queries re-attend to the
            # whole sequence through the dedicated *_global projections, and
            # their output replaces the local-pass rows (HF Longformer
            # semantics; reference usage: longformer_for_ts.py:55-58).
            qkv_g = FusedQKV(nh, hd, dtype=self.dtype, name="qkv_global")(hidden)
            qg, kg, vg = jnp.moveaxis(qkv_g, 2, 0)
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, dtype=self.dtype))
            if sliding_chunked:
                # O(G * L): only the (static-capped) global rows are computed
                G = cfg.max_global_tokens
                is_g = global_mask.astype(bool) & raw_attention_mask.astype(bool)
                g_idx = jnp.argsort(-is_g.astype(jnp.int32), axis=1, stable=True)[:, :G]
                g_valid = jnp.take_along_axis(is_g, g_idx, axis=1)  # (B, G)
                gather_rows = lambda x: jnp.take_along_axis(
                    x, g_idx[:, :, None, None].repeat(nh, 2).repeat(hd, 3), axis=1
                )
                qg_rows = gather_rows(qg)  # (B, G, nh, hd)
                g_scores = jnp.einsum("bghd,bmhd->bhgm", qg_rows * scale, kg)
                pad_bias = (
                    1.0 - raw_attention_mask[:, None, None, :].astype(jnp.float32)
                ) * NEG_INF
                g_scores = g_scores + pad_bias.astype(g_scores.dtype)
                g_probs = jax.nn.softmax(g_scores.astype(jnp.float32), axis=-1).astype(
                    self.dtype
                )
                g_probs = nn.Dropout(cfg.attention_dropout)(
                    g_probs, deterministic=deterministic
                )
                g_rows_ctx = jnp.einsum("bhgm,bmhd->bghd", g_probs, vg)
                existing = gather_rows(ctx)
                vals = jnp.where(g_valid[:, :, None, None], g_rows_ctx, existing)
                ctx = ctx.at[jnp.arange(B)[:, None], g_idx].set(vals)
            else:
                g_scores = jnp.einsum("blhd,bmhd->bhlm", qg * scale, kg)
                if key_padding_bias is not None:
                    g_scores = g_scores + key_padding_bias.astype(g_scores.dtype)
                g_probs = jax.nn.softmax(g_scores.astype(jnp.float32), axis=-1).astype(
                    self.dtype
                )
                g_probs = nn.Dropout(cfg.attention_dropout)(
                    g_probs, deterministic=deterministic
                )
                g_ctx = jnp.einsum("bhlm,bmhd->blhd", g_probs, vg)
                is_global = global_mask.astype(bool)[:, :, None, None]
                ctx = jnp.where(is_global, g_ctx, ctx)

        out = AttnOutProj(H, dtype=self.dtype, quantize=quant, name="out")(
            ctx, layout=out_layout
        )
        if output_attentions:
            return out, probs
        return out, None


class TransformerLayer(nn.Module):
    """Post-LayerNorm transformer block (BERT convention)."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attention_bias: Optional[Array],
        deterministic: bool = True,
        output_attentions: bool = False,
        flash_segment_ids: Optional[Array] = None,
        use_flash: bool = False,
        global_mask: Optional[Array] = None,
        key_padding_bias: Optional[Array] = None,
        raw_attention_mask: Optional[Array] = None,
        attention_impl: Optional[str] = None,
        collect_raw: bool = False,
        sliding_fused: bool = False,
        sliding_global_rows: bool = True,
        bigbird_fused: bool = False,
        sliding_train_fused: bool = False,
        bigbird_train_fused: bool = False,
    ):
        cfg = self.config
        impl = attention_impl or cfg.attention_impl
        quant = cfg.quantize == "w8a8" and deterministic

        if collect_raw:
            # whole-stack megakernel path: create this layer's params (same
            # tree as every other path) and return them for stacking
            B, L, H = hidden.shape
            ln1s, ln1b = _LNParams(H, name="attention_ln")()
            (qkv_k, qkv_b, out_k, out_b), _ = SelfAttention(
                cfg, dtype=self.dtype, name="attention"
            )(hidden, None, deterministic, collect_raw=True)
            w1, b1 = _DenseParams(H, cfg.intermediate_size, name="mlp_in")()
            w2, b2 = _DenseParams(cfg.intermediate_size, H, name="mlp_out")()
            ln2s, ln2b = _LNParams(H, name="mlp_ln")()
            return {
                "qkv_kernel": qkv_k,
                "qkv_bias": qkv_b,
                "out_kernel": out_k,
                "out_bias": out_b,
                "ln1_scale": ln1s,
                "ln1_bias": ln1b,
                "mlp_w1": w1,
                "mlp_b1": b1,
                "mlp_w2": w2,
                "mlp_b2": b2,
                "ln2_scale": ln2s,
                "ln2_bias": ln2b,
            }, None

        # Fused half-layer path (TPU inference): the whole layer is TWO
        # Pallas kernels — h1 = LN(x + attn(x)) in the attention-block kernel
        # (ops/pallas/attention_block.py) and h2 = LN(h1 + mlp(h1)) in the
        # MLP-block kernel (ops/pallas/mlp_block.py). The (B, L, 4H)
        # intermediate and q/k/v never touch HBM; dropout is inactive on
        # this deterministic path (as in any inference).
        fused_half = (
            impl == "fused"
            and cfg.attention_type == "dense"
            and flash_segment_ids is not None
            and not output_attentions
            and deterministic  # kernels skip dropout and have no VJP
        )
        fused_sliding = (
            sliding_fused
            and raw_attention_mask is not None
            and global_mask is not None
            and not output_attentions
            and deterministic
        )
        fused_bigbird = (
            bigbird_fused
            and raw_attention_mask is not None
            and not output_attentions
            and deterministic
        )
        train_fused = (
            impl == "train_fused"
            and cfg.attention_type == "dense"
            and flash_segment_ids is not None
            and not output_attentions
        )
        train_fused_sliding = (
            sliding_train_fused
            and impl == "train_fused"
            and cfg.attention_type == "sliding_window"
            and raw_attention_mask is not None
            and global_mask is not None
            and not output_attentions
        )
        train_fused_bigbird = (
            bigbird_train_fused
            and impl == "train_fused"
            and cfg.attention_type == "bigbird"
            and raw_attention_mask is not None
            and not output_attentions
        )
        if train_fused or train_fused_sliding or train_fused_bigbird:
            # TRAINING fused path: attention block + MLP core are Pallas
            # kernels with custom VJPs (flash-style recompute, in-kernel prob
            # dropout); hidden-state dropout / residual / LN stay in XLA.
            # NOTE: the in-kernel gelu is the tanh form (Mosaic has no erf);
            # |delta| <= 3e-4 vs the einsum path's exact-erf gelu.
            from spokennlp_tpu.ops.pallas.train_blocks import mlp_block_train

            attn_out, _ = SelfAttention(cfg, dtype=self.dtype, name="attention")(
                hidden,
                attention_bias,
                deterministic,
                False,
                flash_segment_ids=flash_segment_ids,
                global_mask=global_mask if train_fused_sliding else None,
                raw_attention_mask=(
                    raw_attention_mask
                    if (train_fused_sliding or train_fused_bigbird)
                    else None
                ),
                attention_impl="train_fused",
                sliding_global_rows=sliding_global_rows,
            )
            attn_out = nn.Dropout(cfg.hidden_dropout)(
                attn_out, deterministic=deterministic
            )
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attention_ln"
            )(hidden + attn_out)
            B, L, H = hidden.shape
            w1, b1 = _DenseParams(H, cfg.intermediate_size, name="mlp_in")()
            w2, b2 = _DenseParams(cfg.intermediate_size, H, name="mlp_out")()
            mlp = mlp_block_train(
                hidden.reshape(B * L, H),
                w1,
                b1,
                w2,
                b2,
                activation=cfg.hidden_act,
                interpret=jax.default_backend() == "cpu",
            ).reshape(B, L, H)
            mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mlp_ln"
            )(hidden + mlp)
            return hidden, None

        if fused_half or fused_sliding or fused_bigbird:
            from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block

            B, L, H = hidden.shape
            ln1 = _LNParams(H, name="attention_ln")()
            h1, _ = SelfAttention(cfg, dtype=self.dtype, name="attention")(
                hidden,
                attention_bias,
                deterministic,
                False,
                flash_segment_ids=flash_segment_ids,
                global_mask=global_mask,
                raw_attention_mask=raw_attention_mask,
                attention_impl="fused",
                fused_ln=ln1,
                sliding_fused=fused_sliding,
                sliding_global_rows=sliding_global_rows,
                bigbird_fused=fused_bigbird,
            )
            w1, b1 = _DenseParams(H, cfg.intermediate_size, name="mlp_in")()
            w2, b2 = _DenseParams(cfg.intermediate_size, H, name="mlp_out")()
            ln2_scale, ln2_bias = _LNParams(H, name="mlp_ln")()
            out = fused_mlp_block(
                h1.reshape(B * L, H),
                w1,
                b1,
                w2,
                b2,
                ln2_scale,
                ln2_bias,
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                quantized=quant,
                interpret=jax.default_backend() == "cpu",
            )
            return out.reshape(B, L, H), None

        attn_out, probs = SelfAttention(cfg, dtype=self.dtype, name="attention")(
            hidden,
            attention_bias,
            deterministic,
            output_attentions,
            flash_segment_ids=flash_segment_ids,
            use_flash=use_flash,
            global_mask=global_mask,
            key_padding_bias=key_padding_bias,
            raw_attention_mask=raw_attention_mask,
            attention_impl=attention_impl,
        )
        attn_out = nn.Dropout(cfg.hidden_dropout)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attention_ln"
        )(hidden + attn_out)

        if quant:
            # activation fused into the mlp_in kernel epilogue
            mlp = QuantDense(
                cfg.intermediate_size,
                dtype=self.dtype,
                activation=cfg.hidden_act,
                name="mlp_in",
            )(hidden)
            mlp = QuantDense(cfg.hidden_size, dtype=self.dtype, name="mlp_out")(mlp)
        else:
            mlp = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_in")(
                hidden
            )
            mlp = ACT2FN[cfg.hidden_act](mlp)
            mlp = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_out")(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mlp_ln"
        )(hidden + mlp)
        return hidden, probs


class Encoder(nn.Module):
    """The trunk: embeddings → N transformer layers → optional pooler.

    Behavioral parity target: HF ``BertModel`` forward (validated by
    tests/test_hf_parity.py against a randomly-initialized torch BertModel
    through weight conversion).
    """

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Optional[Array] = None,
        token_type_ids: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        global_attention_mask: Optional[Array] = None,
        pack_segment_ids: Optional[Array] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
        prefix_globals: Optional[int] = None,
    ) -> EncoderOutput:
        """``prefix_globals``: static promise that global tokens occur only in
        the first N positions AND padding is a suffix (true for the CLS-only
        masks the task models build + the right-padding featurizers). Enables
        the fused sliding-window Pallas kernel on TPU inference."""
        cfg = self.config
        B, L = input_ids.shape

        if attention_mask is None:
            attention_mask = jnp.ones((B, L), dtype=jnp.int32)

        # Attention impl resolution. "auto" picks the fused attention-block
        # megakernel (ops/pallas/attention_block.py) on TPU inference — the
        # measured ranking at BERT-base/B=128/L=512 on v5e is fused 1943 >
        # pallas 1291 > einsum 1140 > jax-flash 1041 windows/s. Training
        # keeps einsum: the kernels skip attention-prob dropout and the
        # fused block has no custom VJP yet. Off-TPU, einsum.
        impl = cfg.attention_impl
        if impl == "auto":
            on_tpu = jax.default_backend() in ("tpu", "axon")
            if on_tpu and deterministic and not output_attentions:
                # small batches are dispatch/launch-bound: the whole-stack
                # megakernel (1 pallas_call) beats 2-per-layer kernels by ~6%
                # at B=8 and is bit-identical in quantized mode; at large B
                # the two are neutral and "fused" keeps per-layer hiddens
                # available
                impl = "stack" if B <= 32 and not output_hidden_states else "fused"
            elif (
                on_tpu
                and not deterministic
                and not output_attentions
                and cfg.attention_type in ("dense", "sliding_window", "bigbird")
            ):
                # TRAINING: custom-VJP fused blocks (train_blocks.py dense /
                # train_sliding.py banded+global / train_bigbird.py ITC) —
                # no (nh, L, L) or (L, 3C) residuals in HBM, hardware-PRNG
                # prob dropout
                impl = "train_fused"
            else:
                impl = "einsum"
        if impl == "train_fused" and cfg.attention_type not in (
            "dense", "sliding_window", "bigbird"
        ):
            impl = "einsum"
        if (
            impl == "train_fused"
            and not deterministic
            and cfg.attention_dropout > 0
            and jax.default_backend() == "cpu"
        ):
            # interpret-mode has no lowering for the in-kernel hardware PRNG;
            # prob-dropout training off-TPU takes the einsum path
            impl = "einsum"
        use_stack = (
            impl == "stack"
            and cfg.attention_type == "dense"
            and deterministic  # the kernel skips dropout and has no VJP
            and not output_attentions
            and not output_hidden_states  # intermediate hiddens stay in VMEM
        )
        if impl == "stack" and not use_stack:
            impl = "fused" if deterministic and not output_attentions else "einsum"
        use_flash = (
            cfg.attention_type == "dense"
            and not output_attentions
            and impl == "flash"
            and flash_available(L, cfg.head_dim)
        )
        use_pallas = (
            cfg.attention_type == "dense"
            and not output_attentions
            and impl in ("pallas", "fused", "stack", "train_fused")
        )

        bias = None
        flash_segment_ids = None
        key_padding_bias = None
        sliding_chunked = False
        sliding_fused = False
        sliding_train_fused = False
        bigbird_block = False
        bigbird_fused = False
        bigbird_train_fused = False
        if use_flash or use_pallas:
            if pack_segment_ids is not None:
                # pad tokens = 0, window i = i+1 (caller contract)
                flash_segment_ids = pack_segment_ids
            else:
                flash_segment_ids = attention_mask.astype(jnp.int32)
        elif cfg.attention_type == "dense":
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
            if pack_segment_ids is not None:
                same = pack_segment_ids[:, :, None] == pack_segment_ids[:, None, :]
                bias = bias + jnp.where(same, 0.0, NEG_INF)[:, None, :, :]
        elif cfg.attention_type == "bigbird":
            from spokennlp_tpu.ops.bigbird_attention import bigbird_attention_bias

            bb_impl = cfg.bigbird_impl
            bigbird_fused_ok = (
                impl in ("fused", "stack")
                and deterministic
                and not output_attentions
                and prefix_globals is not None  # suffix-padding promise
                and L % cfg.bigbird_block_size == 0
                and cfg.bigbird_block_size % 8 == 0
            )
            if bb_impl == "auto":
                bb_impl = (
                    "fused"
                    if bigbird_fused_ok
                    else ("block" if L > 1024 else "bias")
                )
            assert L % cfg.bigbird_block_size == 0, (
                f"bigbird needs L ({L}) divisible by block_size "
                f"({cfg.bigbird_block_size})"
            )
            bigbird_train_ok = (
                impl == "train_fused"
                and not output_attentions
                and prefix_globals is not None  # suffix-padding promise
                and L % cfg.bigbird_block_size == 0
                and cfg.bigbird_block_size % 8 == 0
            )
            if impl == "train_fused" and not bigbird_train_ok:
                impl = "einsum"  # contract not met: XLA block/bias training
            if bigbird_train_ok:
                # custom-VJP fused BigBird training block
                # (ops/pallas/train_bigbird.py); bias stays None, the raw
                # mask flows to the layer
                bigbird_train_fused = True
            elif bb_impl == "fused" and bigbird_fused_ok:
                bigbird_fused = True
            elif bb_impl == "bias":
                bias = bigbird_attention_bias(
                    attention_mask,
                    cfg.bigbird_block_size,
                    cfg.bigbird_num_global_blocks,
                    cfg.bigbird_num_random_blocks,
                    cfg.bigbird_seed,
                )
            else:
                # block path: bias stays None; SelfAttention dispatches on
                # raw_attention_mask
                bigbird_block = True
        elif cfg.attention_type == "sliding_window":
            sw_impl = cfg.sliding_window_impl
            C_half = max(cfg.attention_window // 2, 1)
            fused_sliding_ok = (
                impl in ("fused", "stack")  # TPU-inference impl resolution
                and deterministic
                and not output_attentions
                and prefix_globals is not None
                and prefix_globals <= cfg.max_global_tokens
                and global_attention_mask is not None
                and L % C_half == 0
                and C_half % 8 == 0
            )
            train_sliding_ok = (
                impl == "train_fused"
                and not output_attentions
                and prefix_globals is not None  # suffix-padding promise
                and prefix_globals <= cfg.max_global_tokens
                and global_attention_mask is not None
                and L % C_half == 0
                and C_half % 8 == 0
            )
            if impl == "train_fused" and not train_sliding_ok:
                impl = "einsum"  # contract not met: chunked einsum training
            if sw_impl == "auto":
                sw_impl = (
                    "fused"
                    if fused_sliding_ok
                    else ("chunked" if L > 1024 else "bias")
                )
            if impl == "train_fused" and train_sliding_ok:
                # custom-VJP fused Longformer training block
                # (ops/pallas/train_sliding.py); bias stays None, raw masks
                # flow to the layer
                sliding_train_fused = True
            elif sw_impl == "fused" and fused_sliding_ok:
                # one-kernel Longformer block (ops/pallas/sliding_block.py);
                # bias stays None, SelfAttention consumes the raw masks
                sliding_fused = True
            elif sw_impl in ("chunked", "fused") and L % C_half == 0:
                # banded O(L * window) path; bias stays None and SelfAttention
                # dispatches on (attention_mask, global_mask) directly
                sliding_chunked = True
            else:
                sliding_chunked = False
                bias = sliding_window_attention_mask_bias(
                    attention_mask,
                    window=cfg.attention_window,
                    global_mask=global_attention_mask,
                    neg_inf=NEG_INF,
                )[:, None, :, :]
            key_padding_bias = (
                (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
            )
        else:
            raise NotImplementedError(
                f"attention_type={cfg.attention_type!r} not wired into the trunk yet"
            )

        hidden = Embeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic
        )

        if use_stack:
            from spokennlp_tpu.ops.pallas.stack_block import fused_encoder_stack

            raws = [
                TransformerLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                    hidden, None, deterministic, collect_raw=True
                )[0]
                for i in range(cfg.num_layers)
            ]
            stacked = {k: jnp.stack([r[k] for r in raws]) for k in raws[0]}
            hidden = fused_encoder_stack(
                hidden,
                flash_segment_ids,
                stacked["qkv_kernel"],
                stacked["qkv_bias"],
                stacked["out_kernel"],
                stacked["out_bias"],
                stacked["ln1_scale"],
                stacked["ln1_bias"],
                stacked["mlp_w1"],
                stacked["mlp_b1"],
                stacked["mlp_w2"],
                stacked["mlp_b2"],
                stacked["ln2_scale"],
                stacked["ln2_bias"],
                sm_scale=1.0 / float(cfg.head_dim) ** 0.5,
                quantized=cfg.quantize == "w8a8",
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                interpret=jax.default_backend() == "cpu",
            )
            pooled = None
            if cfg.add_pooler:
                pooled = nn.tanh(
                    nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(
                        hidden[:, 0]
                    )
                )
            return EncoderOutput(last_hidden_state=hidden, pooled_output=pooled)

        all_hidden = (hidden,) if output_hidden_states else None
        all_attn = () if output_attentions else None
        layer_cls = TransformerLayer
        if cfg.remat and not deterministic:
            # gradient checkpointing: recompute the layer on the backward
            # pass instead of storing its activations (bool/str args are
            # static; self counts as argnum 0)
            layer_cls = nn.remat(
                TransformerLayer,
                static_argnums=(3, 4, 6, 10, 11, 12, 13, 14, 15, 16),
            )
        for i in range(cfg.num_layers):
            hidden, probs = layer_cls(cfg, dtype=self.dtype, name=f"layer_{i}")(
                hidden,
                bias,
                deterministic,
                output_attentions,
                flash_segment_ids,
                use_flash,
                (
                    global_attention_mask
                    if cfg.attention_type == "sliding_window"
                    else None
                ),
                key_padding_bias,
                (
                    attention_mask
                    if (
                        sliding_chunked
                        or bigbird_block
                        or sliding_fused
                        or sliding_train_fused
                        or bigbird_fused
                        or bigbird_train_fused
                    )
                    else None
                ),
                impl,
                False,
                sliding_fused,
                (prefix_globals or 0) > 0,
                bigbird_fused,
                sliding_train_fused,
                bigbird_train_fused,
            )
            if output_hidden_states:
                all_hidden = all_hidden + (hidden,)
            if output_attentions:
                all_attn = all_attn + (probs,)

        pooled = None
        if cfg.add_pooler:
            pooled = nn.tanh(
                nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(hidden[:, 0])
            )

        return EncoderOutput(
            last_hidden_state=hidden,
            pooled_output=pooled,
            hidden_states=all_hidden,
            attentions=all_attn,
        )
