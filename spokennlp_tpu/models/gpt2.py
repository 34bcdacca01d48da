"""GPT-2 causal decoder (Flax) with KV-cache generation, for SLD.

The reference fine-tunes HF GPT2LMHeadModel with a speech-extended vocabulary
(reference: sld/transformers/examples/pytorch/language-modeling/run_clm.py:
455-483 vocab resize; :510-540 sequence packing). This is a fresh Flax
implementation: pre-LayerNorm blocks, fused QKV, learned positions, weight-
tied LM head; generation runs as a jitted lax.while_loop over a static-shape
KV cache (greedy or beam).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    embd_dropout: float = 0.1
    resid_dropout: float = 0.1
    attn_dropout: float = 0.1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class CausalSelfAttention(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        attention_mask: Optional[Array],
        cache: Optional[Dict[str, Array]] = None,
        cache_index: Optional[Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, L, H = hidden.shape
        nh, hd = cfg.num_heads, cfg.head_dim

        # HF GPT-2 init: normal(initializer_range); the residual projection
        # (c_proj) additionally scaled by 1/sqrt(2*n_layer). Flax defaults
        # (lecun_normal Dense, normal(1.0) Embed) train MEASURABLY worse
        # from scratch with the tied LM head (unit-scale wte saturates the
        # softmax at step 0 — caught by the SLD parity harness).
        w_init = nn.initializers.normal(0.02)
        proj_init = nn.initializers.normal(
            0.02 / (2 * cfg.num_layers) ** 0.5
        )
        qkv = nn.DenseGeneral((3, nh, hd), axis=-1, dtype=self.dtype,
                              kernel_init=w_init, name="qkv")(hidden)
        q, k, v = jnp.moveaxis(qkv, 2, 0)

        new_cache = None
        if cache is not None:
            # prefill (L = prompt len, cache_index = 0) or decode (L = 1):
            # write k/v at [cache_index, cache_index + L)
            ck, cv = cache["k"], cache["v"]  # (B, T, nh, hd)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
            T = k.shape[1]
            pos = jnp.arange(T)
            ql = cache_index + jnp.arange(L)
            mask = pos[None, :] <= ql[:, None]  # (L, T) causal w.r.t. cache slots
            mask = mask[None, None, :, :]
            if attention_mask is not None:  # full-length (B, T) mask
                mask = mask & attention_mask[:, None, None, :].astype(bool)
            bias = jnp.where(mask, 0.0, NEG_INF)
        else:
            T = L
            causal = jnp.tril(jnp.ones((L, L), bool))[None, None, :, :]
            mask = causal
            if attention_mask is not None:
                mask = mask & attention_mask[:, None, None, :].astype(bool)
            bias = jnp.where(mask, 0.0, NEG_INF)

        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, self.dtype))
        scores = jnp.einsum("blhd,bmhd->bhlm", q * scale, k.astype(q.dtype))
        scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attn_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v.astype(q.dtype))
        out = nn.DenseGeneral(H, axis=(-2, -1), dtype=self.dtype,
                              kernel_init=proj_init, name="out")(ctx)
        return out, new_cache


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_mask, cache=None, cache_index=None, deterministic=True):
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln_1")(hidden)
        attn, new_cache = CausalSelfAttention(cfg, dtype=self.dtype, name="attn")(
            x, attention_mask, cache, cache_index, deterministic
        )
        attn = nn.Dropout(cfg.resid_dropout)(attn, deterministic=deterministic)
        hidden = hidden + attn
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln_2")(hidden)
        mlp = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.02),
                       name="mlp_in")(x)
        mlp = nn.gelu(mlp, approximate=True)
        mlp = nn.Dense(
            cfg.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.normal(
                0.02 / (2 * cfg.num_layers) ** 0.5),
            name="mlp_out")(mlp)
        mlp = nn.Dropout(cfg.resid_dropout)(mlp, deterministic=deterministic)
        return hidden + mlp, new_cache


class GPT2LMModel(nn.Module):
    """Decoder + weight-tied LM head."""

    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        cache: Optional[Tuple] = None,
        cache_index: Optional[Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, L = input_ids.shape
        # HF init: wte/wpe normal(0.02) — flax's default Embed init is
        # normal(1.0), which with the TIED head yields unit-scale logits at
        # step 0 and cripples from-scratch training (see CausalSelfAttention)
        wte = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       embedding_init=nn.initializers.normal(0.02),
                       name="wte")
        wpe = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="wpe"
        )
        if position_ids is None:
            offset = cache_index if cache_index is not None else 0
            position_ids = offset + jnp.arange(L, dtype=jnp.int32)[None, :]
        hidden = wte(input_ids) + wpe(position_ids)
        hidden = nn.Dropout(cfg.embd_dropout)(hidden, deterministic=deterministic)

        new_caches = []
        for i in range(cfg.num_layers):
            layer_cache = cache[i] if cache is not None else None
            hidden, new_cache = GPT2Block(cfg, dtype=self.dtype, name=f"h_{i}")(
                hidden, attention_mask, layer_cache, cache_index, deterministic
            )
            new_caches.append(new_cache)

        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln_f")(hidden)
        logits = wte.attend(hidden.astype(jnp.float32))
        out = {"logits": logits, "hidden": hidden}
        if cache is not None:
            out["cache"] = tuple(new_caches)
        return out


def init_cache(cfg: GPT2Config, batch_size: int, max_len: int, dtype=jnp.float32):
    return tuple(
        {
            "k": jnp.zeros((batch_size, max_len, cfg.num_heads, cfg.head_dim), dtype),
            "v": jnp.zeros((batch_size, max_len, cfg.num_heads, cfg.head_dim), dtype),
        }
        for _ in range(cfg.num_layers)
    )


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------


def gpt2_hf_to_params(sd: Dict[str, np.ndarray], cfg: GPT2Config, prefix: str = "transformer.") -> Dict:
    """Map an HF GPT2LMHeadModel state dict onto GPT2LMModel params.

    HF GPT-2 uses Conv1D (weights already (in, out)) — no transpose needed.
    """
    H, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    p = prefix
    params: Dict = {
        "wte": {"embedding": sd[p + "wte.weight"][: cfg.vocab_size]},
        "wpe": {"embedding": sd[p + "wpe.weight"]},
        "ln_f": {"scale": sd[p + "ln_f.weight"], "bias": sd[p + "ln_f.bias"]},
    }
    for i in range(cfg.num_layers):
        lp = f"{p}h.{i}."
        cw = sd[lp + "attn.c_attn.weight"]  # (H, 3H), columns [q|k|v]
        cb = sd[lp + "attn.c_attn.bias"]
        qkv_kernel = cw.reshape(H, 3, nh, hd)
        qkv_bias = cb.reshape(3, nh, hd)
        params[f"h_{i}"] = {
            "ln_1": {"scale": sd[lp + "ln_1.weight"], "bias": sd[lp + "ln_1.bias"]},
            "ln_2": {"scale": sd[lp + "ln_2.weight"], "bias": sd[lp + "ln_2.bias"]},
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {
                    "kernel": sd[lp + "attn.c_proj.weight"].reshape(nh, hd, H),
                    "bias": sd[lp + "attn.c_proj.bias"],
                },
            },
            "mlp_in": {
                "kernel": sd[lp + "mlp.c_fc.weight"],
                "bias": sd[lp + "mlp.c_fc.bias"],
            },
            "mlp_out": {
                "kernel": sd[lp + "mlp.c_proj.weight"],
                "bias": sd[lp + "mlp.c_proj.bias"],
            },
        }
    return params


def resize_token_embeddings(params: Dict, new_vocab_size: int, seed: int = 0) -> Dict:
    """Extend wte rows (normal init, std 0.02 — HF resize behavior)."""
    import copy

    params = copy.deepcopy(params)
    emb = np.asarray(params["wte"]["embedding"])
    old, H = emb.shape
    if new_vocab_size <= old:
        params["wte"]["embedding"] = emb[:new_vocab_size]
        return params
    rng = np.random.default_rng(seed)
    extra = rng.normal(0.0, 0.02, size=(new_vocab_size - old, H)).astype(emb.dtype)
    params["wte"]["embedding"] = np.concatenate([emb, extra], axis=0)
    return params
