"""WavLM encoder (Flax): on-device speech feature extraction for SLD.

The reference vendors torch WavLM and dumps layer-23 features on GPUs
(reference: sld/fairseq/examples/hubert/simple_kmeans/dump_wavlm_feature.py:
38-112, vendored model WavLM.py/modules.py ~1570 LoC); round 1 shelled out
to host torch. This is a TPU-native Flax implementation, weight-compatible
with HF ``transformers.WavLMModel`` checkpoints (conversion + parity tested
against the HF torch model):

- conv waveform feature extractor (group-norm first layer for the "group"
  norm variant, per-layer LayerNorm for "layer"), GELU;
- feature projection (LayerNorm -> Linear);
- grouped positional conv embedding (weight-norm folded into a plain kernel
  at conversion time, same-pad trim);
- transformer encoder with WavLM's GATED RELATIVE POSITION BIAS: a bucketed
  relative-position embedding computed once (layer 0) and re-gated per layer
  from the attention input; both post-LN ("base") and stable pre-LN
  ("large") layer variants.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False  # True for WavLM-Large
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    # False = HuBERT: identical stack minus the gated relative-position bias
    # (reference alternative dumper: simple_kmeans/dump_hubert_feature.py)
    use_rel_pos_bias: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def relative_position_buckets(
    seq_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """(L, L) int bucket ids, WavLM's bidirectional T5-style bucketing
    (HF WavLMAttention._relative_positions_bucket semantics)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact) * (nb - max_exact)
    large = (max_exact + large).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class _FeatureEncoder(nn.Module):
    """Raw waveform (B, T) -> (B, frames, conv_dim[-1])."""

    cfg: WavLMConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Array) -> Array:
        c = self.cfg
        x = waveform[:, :, None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, k, s) in enumerate(
            zip(c.conv_dim, c.conv_kernel, c.conv_stride)
        ):
            x = nn.Conv(
                dim,
                kernel_size=(k,),
                strides=(s,),
                use_bias=c.conv_bias,
                padding="VALID",
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if c.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, dtype=self.dtype, name="group_norm"
                )(x)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"conv_ln_{i}"
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class _GatedRelPosAttention(nn.Module):
    """Self-attention with WavLM's gated relative position bias."""

    cfg: WavLMConfig
    has_relative_position_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,  # (B, L, H)
        position_bias: Optional[Array],  # (nh, L, L) or None
        attention_mask: Optional[Array] = None,  # (B, L) 1 = real
    ):
        c = self.cfg
        B, L, H = x.shape
        nh, hd = c.num_heads, c.head_dim

        if not c.use_rel_pos_bias:  # HuBERT: plain MHA
            gated_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
        elif position_bias is None:
            assert self.has_relative_position_bias
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02), (c.num_buckets, nh)
            )
            buckets = jnp.asarray(
                relative_position_buckets(L, c.num_buckets, c.max_bucket_distance)
            )
            position_bias = jnp.transpose(
                rel_embed.astype(jnp.float32)[buckets], (2, 0, 1)
            )  # (nh, L, L)

        if c.use_rel_pos_bias:
            # per-layer gate from the attention INPUT viewed per head
            # (HF WavLMAttention.forward steps 1-4)
            ghs = x.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)  # (B, nh, L, hd)
            proj = nn.Dense(8, dtype=self.dtype, name="gru_rel_pos_linear")(ghs)
            proj = proj.reshape(B, nh, L, 2, 4).sum(-1)
            gates = jax.nn.sigmoid(proj.astype(jnp.float32))
            gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # (B, nh, L, 1)
            const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, nh, 1, 1)
            )
            gate = gate_a * (gate_b * const.astype(jnp.float32) - 1.0) + 2.0
            gated_bias = gate * position_bias[None]  # (B, nh, L, L)

        q = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name="q_proj")(x)
        k = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name="k_proj")(x)
        v = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name="v_proj")(x)
        scale = 1.0 / math.sqrt(hd)
        scores = jnp.einsum("blnd,bmnd->bnlm", q * scale, k).astype(jnp.float32)
        scores = scores + gated_bias
        if attention_mask is not None:
            pad = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
            scores = scores + pad
        probs = jax.nn.softmax(scores, -1).astype(self.dtype)
        ctx = jnp.einsum("bnlm,bmnd->blnd", probs, v)
        out = nn.DenseGeneral(H, axis=(-2, -1), dtype=self.dtype, name="out_proj")(ctx)
        return out, position_bias


class _EncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, attention_mask=None):
        c = self.cfg
        attn_mod = _GatedRelPosAttention(
            c, self.has_relative_position_bias, dtype=self.dtype, name="attention"
        )
        ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")
        fln = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )

        def ff(h):
            h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="ff_in")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(c.hidden_size, dtype=self.dtype, name="ff_out")(h)

        if c.do_stable_layer_norm:  # WavLM-Large pre-LN
            attn, position_bias = attn_mod(ln(x), position_bias, attention_mask)
            x = x + attn
            x = x + ff(fln(x))
        else:  # base post-LN
            attn, position_bias = attn_mod(x, position_bias, attention_mask)
            x = ln(x + attn)
            x = fln(x + ff(x))
        return x, position_bias


class WavLMModel(nn.Module):
    """waveform (B, T) -> hidden states; `layer` selects the tap point
    (the SLD recipe taps layer 23 of WavLM-Large, dump_wavlm_feature.py)."""

    cfg: WavLMConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        waveform: Array,
        attention_mask: Optional[Array] = None,  # frame-level (B, frames)
        output_hidden_states: bool = False,
    ):
        c = self.cfg
        feats = _FeatureEncoder(c, dtype=self.dtype, name="feature_extractor")(
            waveform
        )
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="feat_ln"
        )(feats)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="feat_proj")(x)

        # grouped positional conv embedding; torch pads k//2 both sides and
        # trims one frame for even kernels (WavLMSamePadLayer)
        k = c.num_conv_pos_embeddings
        pos = nn.Conv(
            c.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="pos_conv",
        )(x)
        if k % 2 == 0:
            pos = pos[:, :-1]
        x = x + nn.gelu(pos, approximate=False)
        if not c.do_stable_layer_norm:
            x = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=self.dtype, name="encoder_ln"
            )(x)

        hidden_states: List[Array] = [x]
        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = _EncoderLayer(
                c,
                has_relative_position_bias=(i == 0),
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, position_bias, attention_mask)
            hidden_states.append(x)
        if c.do_stable_layer_norm:
            x = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=self.dtype, name="encoder_ln"
            )(x)
            hidden_states[-1] = x
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }


# ---------------------------------------------------------------------------
# HF conversion + feature extraction driver
# ---------------------------------------------------------------------------


def hf_wavlm_config_to_config(hf_cfg) -> WavLMConfig:
    return WavLMConfig(
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        conv_dim=tuple(hf_cfg.conv_dim),
        conv_kernel=tuple(hf_cfg.conv_kernel),
        conv_stride=tuple(hf_cfg.conv_stride),
        conv_bias=hf_cfg.conv_bias,
        feat_extract_norm=hf_cfg.feat_extract_norm,
        do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
        num_buckets=hf_cfg.num_buckets,
        max_bucket_distance=hf_cfg.max_bucket_distance,
        layer_norm_eps=hf_cfg.layer_norm_eps,
    )


def hf_hubert_config_to_config(hf_cfg) -> WavLMConfig:
    """transformers HubertConfig -> WavLMConfig with the rel-pos bias off
    (HuBERT = the same wav2vec2-family stack with plain MHA; reference
    dumper: simple_kmeans/dump_hubert_feature.py)."""
    return WavLMConfig(
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        conv_dim=tuple(hf_cfg.conv_dim),
        conv_kernel=tuple(hf_cfg.conv_kernel),
        conv_stride=tuple(hf_cfg.conv_stride),
        conv_bias=hf_cfg.conv_bias,
        feat_extract_norm=hf_cfg.feat_extract_norm,
        do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        use_rel_pos_bias=False,
    )


def hf_wavlm_to_params(sd: Dict[str, np.ndarray], cfg: WavLMConfig) -> Dict:
    """transformers WavLMModel numpy state dict -> Flax params."""
    c = cfg
    nh, hd = c.num_heads, c.head_dim

    def ln(name):
        return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}

    def dense(name):
        return {"kernel": sd[name + ".weight"].T, "bias": sd[name + ".bias"]}

    fe: Dict[str, Any] = {}
    for i in range(len(c.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}."
        # torch conv1d weight (O, I, K) -> flax (K, I, O)
        conv = {"kernel": sd[base + "conv.weight"].transpose(2, 1, 0)}
        if c.conv_bias:
            conv["bias"] = sd[base + "conv.bias"]
        fe[f"conv_{i}"] = conv
        if c.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = ln(base + "layer_norm")
        elif c.feat_extract_norm == "layer":
            fe[f"conv_ln_{i}"] = ln(base + "layer_norm")

    # weight-normed positional conv: fold g * v / ||v|| into a plain kernel.
    # torch parametrized names (new) or weight_g/weight_v (old); dim=2 keeps
    # the kernel axis, so the norm reduces over (O, I/groups).
    p = "encoder.pos_conv_embed.conv."
    if p + "parametrizations.weight.original0" in sd:
        g = sd[p + "parametrizations.weight.original0"]
        v = sd[p + "parametrizations.weight.original1"]
    else:
        g = sd[p + "weight_g"]
        v = sd[p + "weight_v"]
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (O, I/groups, K)
    pos_conv = {"kernel": w.transpose(2, 1, 0), "bias": sd[p + "bias"]}

    params: Dict[str, Any] = {
        "feature_extractor": fe,
        "feat_ln": ln("feature_projection.layer_norm"),
        "feat_proj": dense("feature_projection.projection"),
        "pos_conv": pos_conv,
        "encoder_ln": ln("encoder.layer_norm"),
    }
    for i in range(c.num_layers):
        b = f"encoder.layers.{i}."
        attn = {
            "q_proj": {
                "kernel": sd[b + "attention.q_proj.weight"].T.reshape(
                    c.hidden_size, nh, hd
                ),
                "bias": sd[b + "attention.q_proj.bias"].reshape(nh, hd),
            },
            "k_proj": {
                "kernel": sd[b + "attention.k_proj.weight"].T.reshape(
                    c.hidden_size, nh, hd
                ),
                "bias": sd[b + "attention.k_proj.bias"].reshape(nh, hd),
            },
            "v_proj": {
                "kernel": sd[b + "attention.v_proj.weight"].T.reshape(
                    c.hidden_size, nh, hd
                ),
                "bias": sd[b + "attention.v_proj.bias"].reshape(nh, hd),
            },
            "out_proj": {
                "kernel": sd[b + "attention.out_proj.weight"].T.reshape(
                    nh, hd, c.hidden_size
                ),
                "bias": sd[b + "attention.out_proj.bias"],
            },
        }
        if c.use_rel_pos_bias:
            attn["gru_rel_pos_linear"] = dense(b + "attention.gru_rel_pos_linear")
            attn["gru_rel_pos_const"] = sd[b + "attention.gru_rel_pos_const"]
            if i == 0:
                attn["rel_attn_embed"] = sd[b + "attention.rel_attn_embed.weight"]
        params[f"layer_{i}"] = {
            "attention": attn,
            "layer_norm": ln(b + "layer_norm"),
            "final_layer_norm": ln(b + "final_layer_norm"),
            "ff_in": dense(b + "feed_forward.intermediate_dense"),
            "ff_out": dense(b + "feed_forward.output_dense"),
        }
    return params


def extract_wavlm_features(
    model: WavLMModel,
    params,
    waveforms: np.ndarray,  # (B, T) float32, 16 kHz
    layer: int,
    chunk_samples: int = 160_000,
) -> np.ndarray:
    """Layer-tap features for the k-means pipeline, chunked like the
    reference's max_chunk streaming (dump_wavlm_feature.py:74-89).
    Returns (B, frames, H)."""

    @jax.jit
    def run(p, w):
        out = model.apply({"params": p}, w, output_hidden_states=True)
        return out["hidden_states"][layer]

    chunks = []
    T = waveforms.shape[1]
    for s in range(0, T, chunk_samples):
        w = waveforms[:, s : s + chunk_samples]
        if w.shape[1] < model.cfg.conv_kernel[0]:
            break
        chunks.append(np.asarray(run(params, jnp.asarray(w))))
    return np.concatenate(chunks, axis=1)
