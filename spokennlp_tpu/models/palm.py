"""PALM 2.0 encoder-decoder with the pointer-generator copy mechanism.

MUG Track 3's baseline is ModelScope's ``damo/nlp_palm2.0_text-generation_
chinese-base`` driven through build_trainer/pipeline (reference:
alimeeting4mug/src/topic_title_generation/palm_subtitle_generation.py:
371-396); the architecture itself is not in the reference repo. This module
implements the PALM 2.0 architecture (PALM paper, arXiv 2004.07159 §2; the
ModelScope palm_v2 implementation derives from the authors' PreSumm/OpenNMT
stack):

  encoder   BERT trunk (the shared Encoder; PALM-chinese-base = 12-layer BERT)
  decoder   pre-norm transformer decoder, OpenNMT TransformerDecoderLayer
            semantics:
              q  = x + drop(SelfAttn(LN1(x), causal))
              m  = q + drop(CrossAttn(LN2(q), enc_out))
              out= m + w2(drop(gelu(w1(LN_ff(m)))))        # PositionwiseFF
            with SINUSOIDAL positions added to scaled target embeddings and a
            final decoder LayerNorm.
  generator pointer-generator (OpenNMT CopyGenerator semantics):
              p_copy    = sigmoid(linear_copy(h))
              p_vocab   = softmax(linear(h)) * (1 - p_copy)
              p_final   = p_vocab + scatter_add(copy_attn * p_copy, src_ids)
            copy_attn is the LAST decoder layer's cross-attention
            distribution (head-averaged).

Checkpoint conversion: hf_convert.palm_to_params maps the documented
ModelScope palm_v2 state-dict layout (palm.encoder.* = BertModel names,
palm.decoder.transformer_layers.N.{self_attn,context_attn}.
{linear_query,linear_keys,linear_values,final_linear},
layer_norm_1/layer_norm_2, feed_forward.{w_1,w_2,layer_norm},
palm.decoder.{embeddings,layer_norm}, generator.{linear,linear_copy}) onto
this module; structural self-test in tests/test_palm.py. Offline caveat
(zero egress): the name walk follows the public PreSumm/OpenNMT layout the
ModelScope port keeps; probing a real checkpoint dir may require only prefix
tweaks, not remaps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder

Array = jax.Array
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class PalmConfig:
    vocab_size: int = 21128  # Chinese BERT vocab
    hidden_size: int = 768
    num_decoder_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_target_length: int = 128
    layer_norm_eps: float = 1e-6  # OpenNMT LayerNorm default
    dropout: float = 0.1
    bos_token_id: int = 101  # [CLS] starts generation (PALM convention)
    eos_token_id: int = 102  # [SEP]
    pad_token_id: int = 0
    use_copy: bool = True


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """OpenNMT PositionalEncoding table (sin on even, cos on odd dims)."""
    pe = np.zeros((max_len, dim), np.float32)
    position = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, dim, 2).astype(np.float32) * -(np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class PalmDecoderLayer(nn.Module):
    cfg: PalmConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        enc_out: Array,
        enc_mask: Array,  # (B, S)
        self_mask: Array,  # (1|B, 1, Lt, Lt) additive
        deterministic: bool = True,
    ):
        c = self.cfg
        H, nh = c.hidden_size, c.num_heads
        hd = H // nh

        def mha(q_in, kv_in, bias, name):
            """OpenNMT MultiHeadedAttention: four (H, H) linears."""
            q = nn.Dense(H, dtype=self.dtype, name=f"{name}_query")(q_in)
            k = nn.Dense(H, dtype=self.dtype, name=f"{name}_keys")(kv_in)
            v = nn.Dense(H, dtype=self.dtype, name=f"{name}_values")(kv_in)
            B, Lq = q.shape[0], q.shape[1]
            Lk = k.shape[1]
            q = q.reshape(B, Lq, nh, hd)
            k = k.reshape(B, Lk, nh, hd)
            v = v.reshape(B, Lk, nh, hd)
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            s = (
                jnp.einsum(
                    "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
                )
                * scale
                + bias
            )
            p = jax.nn.softmax(s, -1)
            pd = nn.Dropout(c.dropout)(
                p.astype(self.dtype), deterministic=deterministic
            )
            ctx = jnp.einsum("bhlm,bmhd->blhd", pd, v).reshape(B, Lq, H)
            out = nn.Dense(H, dtype=self.dtype, name=f"{name}_final")(ctx)
            return out, p

        # pre-norm self attention
        xn = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm_1")(x)
        sa, _ = mha(xn, xn, self_mask, "self_attn")
        q = x + nn.Dropout(c.dropout)(sa, deterministic=deterministic)

        # pre-norm cross attention
        qn = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm_2")(q)
        cross_bias = (1.0 - enc_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        ca, cross_probs = mha(qn, enc_out, cross_bias, "context_attn")
        m = q + nn.Dropout(c.dropout)(ca, deterministic=deterministic)

        # PositionwiseFeedForward: x + w_2(drop(gelu(w_1(LN(x)))))
        fn = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ff_layer_norm")(m)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="w_1")(fn)
        inter = nn.gelu(inter, approximate=False)
        inter = nn.Dropout(c.dropout)(inter, deterministic=deterministic)
        out = nn.Dense(H, dtype=self.dtype, name="w_2")(inter)
        out = nn.Dropout(c.dropout)(out, deterministic=deterministic)
        return m + out, cross_probs


class PalmModel(nn.Module):
    """PALM 2.0: BERT encoder + pre-norm decoder + pointer-generator.

    ``__call__`` returns per-position LOG-probabilities over the vocab (the
    copy mixture lives in probability space, so downstream consumers get
    log p directly, like ModelScope's generator ends in LogSoftmax).
    """

    enc_cfg: EncoderConfig
    cfg: PalmConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        decoder_input_ids: Array,
        decoder_attention_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, Array]:
        c = self.cfg
        enc = Encoder(self.enc_cfg, dtype=self.dtype, name="encoder")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        enc_out = enc.last_hidden_state

        B, Lt = decoder_input_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype, name="dec_embed"
        )
        pe = sinusoidal_positions(c.max_target_length, c.hidden_size)[:Lt]
        # OpenNMT scales embeddings by sqrt(dim) before adding sinusoids
        x = tok(decoder_input_ids) * jnp.sqrt(
            jnp.asarray(c.hidden_size, self.dtype)
        ) + jnp.asarray(pe, self.dtype)[None]
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)

        causal = jnp.tril(jnp.ones((Lt, Lt), bool))
        if decoder_attention_mask is not None:
            causal = causal[None, :, :] & decoder_attention_mask[:, None, :].astype(
                bool
            )
            self_mask = jnp.where(causal, 0.0, NEG_INF)[:, None, :, :]
        else:
            self_mask = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]

        cross_probs = None
        for i in range(c.num_decoder_layers):
            x, cross_probs = PalmDecoderLayer(
                c, dtype=self.dtype, name=f"decoder_layer_{i}"
            )(x, enc_out, attention_mask, self_mask, deterministic)
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="decoder_ln"
        )(x)

        vocab_logits = nn.Dense(
            c.vocab_size, dtype=jnp.float32, name="generator"
        )(h.astype(jnp.float32))

        if not c.use_copy:
            logp = jax.nn.log_softmax(vocab_logits, -1)
            return {"log_probs": logp, "logits": vocab_logits}

        # pointer-generator (OpenNMT CopyGenerator semantics)
        p_copy = jax.nn.sigmoid(
            nn.Dense(1, dtype=jnp.float32, name="linear_copy")(
                h.astype(jnp.float32)
            )
        )  # (B, Lt, 1)
        p_vocab = jax.nn.softmax(vocab_logits, -1) * (1.0 - p_copy)
        # copy distribution from the last layer's cross attention, averaged
        # over heads, masked to real source tokens
        attn = cross_probs.astype(jnp.float32).mean(axis=1)  # (B, Lt, S)
        attn = attn * attention_mask[:, None, :].astype(jnp.float32)
        attn = attn / jnp.maximum(attn.sum(-1, keepdims=True), 1e-9)
        copy_mass = attn * p_copy  # (B, Lt, S)
        # scatter_add source mass onto vocab ids: one-hot matmul keeps the
        # shape static and rides the MXU (S x V one-hot per batch row)
        src_onehot = jax.nn.one_hot(input_ids, c.vocab_size, dtype=jnp.float32)
        p_final = p_vocab + jnp.einsum("bls,bsv->blv", copy_mass, src_onehot)
        logp = jnp.log(jnp.maximum(p_final, 1e-9))
        return {"log_probs": logp, "logits": vocab_logits, "p_copy": p_copy}


def palm_loss(model: PalmModel, params, batch: Dict[str, Array], rng=None,
              deterministic: bool = True):
    """Teacher-forced NLL over the copy-mixture log-probs (ignore -100)."""
    out = model.apply(
        {"params": params},
        batch["input_ids"],
        batch["attention_mask"],
        batch["decoder_input_ids"],
        decoder_attention_mask=batch.get("decoder_attention_mask"),
        deterministic=deterministic,
        rngs={"dropout": rng} if rng is not None else {},
    )
    logp = out["log_probs"]
    labels = batch["labels"]
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def palm_beam_decode(
    model: PalmModel,
    params,
    input_ids: Array,
    attention_mask: Array,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    max_len: Optional[int] = None,
):
    """Beam decode over the copy-mixture log-probs (mirrors
    seq2seq.beam_decode; titles are short so the decoder re-runs per step)."""
    c = model.cfg
    max_len = max_len or c.max_target_length
    B = input_ids.shape[0]
    K = num_beams

    enc_ids = jnp.repeat(input_ids, K, axis=0)
    enc_mask = jnp.repeat(attention_mask, K, axis=0)

    @jax.jit
    def step(dec_ids, dec_mask):
        out = model.apply(
            {"params": params},
            enc_ids,
            enc_mask,
            dec_ids,
            decoder_attention_mask=dec_mask,
            deterministic=True,
        )
        return out["log_probs"]

    dec = jnp.full((B, K, max_len), c.pad_token_id, jnp.int32).at[:, :, 0].set(
        c.bos_token_id
    )
    dec_mask = jnp.zeros((B, K, max_len), jnp.int32).at[:, :, 0].set(1)
    scores = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)[None, :].repeat(B, 0)
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.ones((B, K), jnp.float32)

    for t in range(1, max_len):
        logp_all = step(dec.reshape(B * K, max_len), dec_mask.reshape(B * K, max_len))
        logp = logp_all[:, t - 1, :].reshape(B, K, -1)
        V = logp.shape[-1]
        pad_only = jnp.full((V,), NEG_INF).at[c.pad_token_id].set(0.0)
        logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)
        cand = (scores[..., None] + logp).reshape(B, K * V)
        scores, idx = jax.lax.top_k(cand, K)
        beam_idx, tok = idx // V, idx % V
        take = lambda x: jnp.take_along_axis(
            x, beam_idx.reshape(B, K, *([1] * (x.ndim - 2))), axis=1
        )
        dec, dec_mask = take(dec), take(dec_mask)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)
        dec = dec.at[:, :, t].set(jnp.where(finished, c.pad_token_id, tok))
        dec_mask = dec_mask.at[:, :, t].set((~finished).astype(jnp.int32))
        lengths = lengths + (~finished).astype(jnp.float32)
        finished = finished | (tok == c.eos_token_id)
        if bool(jnp.all(finished)):
            break

    norm = jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(scores / norm, axis=1)
    return jnp.take_along_axis(dec, best[:, None, None], axis=1)[:, 0, :]
