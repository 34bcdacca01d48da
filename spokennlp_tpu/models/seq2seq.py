"""Encoder-decoder transformer (PALM-2.0-class) for topic title generation.

The reference runs MUG Track 3 through ModelScope's PALM 2.0 trainer
(reference: alimeeting4mug/src/topic_title_generation/
palm_subtitle_generation.py:222-403, noam LR at :326). This is a standard
encoder-decoder: the shared Encoder trunk encodes the topic text; a causal
decoder with cross-attention generates the title; beam decode reuses the
fixed-shape loop machinery of models/generation.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.losses import cross_entropy_with_ignore

Array = jax.Array
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 21128  # Chinese BERT vocab default
    hidden_size: int = 256
    num_decoder_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    max_target_length: int = 64
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    bos_token_id: int = 101
    eos_token_id: int = 102
    pad_token_id: int = 0


class DecoderLayer(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        enc_out: Array,
        enc_mask: Array,
        self_mask: Array,  # (B, 1, Lt, Lt) additive bias
        deterministic: bool = True,
    ) -> Array:
        c = self.cfg
        H = c.hidden_size
        nh = c.num_heads
        hd = H // nh

        def mha(q_in, kv_in, bias, name):
            q = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name=f"{name}_q")(q_in)
            k = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name=f"{name}_k")(kv_in)
            v = nn.DenseGeneral((nh, hd), axis=-1, dtype=self.dtype, name=f"{name}_v")(kv_in)
            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, self.dtype))
            s = jnp.einsum("blhd,bmhd->bhlm", q * scale, k) + bias.astype(self.dtype)
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(self.dtype)
            p = nn.Dropout(c.dropout)(p, deterministic=deterministic)
            ctx = jnp.einsum("bhlm,bmhd->blhd", p, v)
            return nn.DenseGeneral(H, axis=(-2, -1), dtype=self.dtype, name=f"{name}_o")(ctx)

        attn = mha(x, x, self_mask, "self")
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="self_ln")(
            x + nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        )
        cross_bias = (1.0 - enc_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        cross = mha(x, enc_out, cross_bias, "cross")
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="cross_ln")(
            x + nn.Dropout(c.dropout)(cross, deterministic=deterministic)
        )
        mlp = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_in")(x)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(H, dtype=self.dtype, name="mlp_out")(mlp)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="mlp_ln")(
            x + nn.Dropout(c.dropout)(mlp, deterministic=deterministic)
        )


class Seq2SeqModel(nn.Module):
    """Encoder trunk + causal decoder with cross-attention + tied LM head."""

    enc_cfg: EncoderConfig
    cfg: Seq2SeqConfig
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
        if enc_out.shape[-1] != c.hidden_size:
            enc_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="enc_proj")(enc_out)

        B, Lt = decoder_input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="dec_embed")
        pos = nn.Embed(
            c.max_target_length, c.hidden_size, dtype=self.dtype, name="dec_pos"
        )
        x = tok(decoder_input_ids) + pos(jnp.arange(Lt)[None, :])
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)

        causal = jnp.tril(jnp.ones((Lt, Lt), bool))
        if decoder_attention_mask is not None:
            causal = causal[None, :, :] & decoder_attention_mask[:, None, :].astype(bool)
            self_mask = jnp.where(causal, 0.0, NEG_INF)[:, None, :, :]
        else:
            self_mask = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]

        for i in range(c.num_decoder_layers):
            x = DecoderLayer(c, dtype=self.dtype, name=f"decoder_layer_{i}")(
                x, enc_out, attention_mask, self_mask, deterministic
            )
        logits = tok.attend(x.astype(jnp.float32))
        return {"logits": logits, "encoder_output": enc_out}


def seq2seq_loss(
    model: Seq2SeqModel,
    params,
    batch: Dict[str, Array],
    rng=None,
    deterministic: bool = True,
):
    """Teacher-forced CE: decoder input = [BOS] target[:-1], labels = target."""
    out = model.apply(
        {"params": params},
        batch["input_ids"],
        batch["attention_mask"],
        batch["decoder_input_ids"],
        decoder_attention_mask=batch.get("decoder_attention_mask"),
        deterministic=deterministic,
        rngs={"dropout": rng} if rng is not None else {},
    )
    return cross_entropy_with_ignore(out["logits"], batch["labels"])


def greedy_decode(
    model: Seq2SeqModel,
    params,
    input_ids: Array,
    attention_mask: Array,
    max_len: Optional[int] = None,
):
    """Greedy title decode (no KV cache — titles are short; the decoder
    re-runs over the growing prefix inside one jit per length, bounded by
    max_target_length)."""
    c = model.cfg
    max_len = max_len or c.max_target_length
    B = input_ids.shape[0]

    @jax.jit
    def step(dec_ids, dec_mask):
        out = model.apply(
            {"params": params},
            input_ids,
            attention_mask,
            dec_ids,
            decoder_attention_mask=dec_mask,
            deterministic=True,
        )
        return out["logits"]

    dec = jnp.full((B, max_len), c.pad_token_id, jnp.int32)
    dec = dec.at[:, 0].set(c.bos_token_id)
    dec_mask = jnp.zeros((B, max_len), jnp.int32).at[:, 0].set(1)
    finished = jnp.zeros((B,), bool)
    for t in range(1, max_len):
        logits = step(dec, dec_mask)
        nxt = jnp.argmax(logits[:, t - 1, :], axis=-1)
        nxt = jnp.where(finished, c.pad_token_id, nxt)
        dec = dec.at[:, t].set(nxt)
        dec_mask = dec_mask.at[:, t].set((~finished).astype(jnp.int32))
        finished = finished | (nxt == c.eos_token_id)
        if bool(jnp.all(finished)):
            break
    return dec


def beam_decode(
    model: Seq2SeqModel,
    params,
    input_ids: Array,
    attention_mask: Array,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    max_len: Optional[int] = None,
):
    """Beam-search title decode (the reference decodes PALM 2.0 with beams;
    alimeeting4mug/src/topic_title_generation/palm_subtitle_generation.py).

    Titles are short, so like greedy_decode the decoder re-runs over the
    growing prefix (no KV cache); beams ride the batch axis (B*K). Each
    beam's length freezes at EOS so the length penalty ranks hypotheses
    that finished at different steps. num_beams=1 reproduces greedy_decode.
    """
    c = model.cfg
    max_len = max_len or c.max_target_length
    B = input_ids.shape[0]
    K = num_beams
    NEG = -1e9

    enc_ids = jnp.repeat(input_ids, K, axis=0)  # (B*K, S)
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
        return out["logits"]

    dec = jnp.full((B, K, max_len), c.pad_token_id, jnp.int32).at[:, :, 0].set(
        c.bos_token_id
    )
    dec_mask = jnp.zeros((B, K, max_len), jnp.int32).at[:, :, 0].set(1)
    scores = jnp.where(jnp.arange(K) == 0, 0.0, NEG)[None, :].repeat(B, 0)
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.ones((B, K), jnp.float32)

    for t in range(1, max_len):
        logits = step(dec.reshape(B * K, max_len), dec_mask.reshape(B * K, max_len))
        logp = jax.nn.log_softmax(
            logits[:, t - 1, :].astype(jnp.float32), -1
        ).reshape(B, K, -1)
        V = logp.shape[-1]
        # finished beams extend only with pad at zero cost
        pad_only = jnp.full((V,), NEG).at[c.pad_token_id].set(0.0)
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
