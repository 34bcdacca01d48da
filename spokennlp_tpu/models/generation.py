"""Autoregressive generation (greedy + beam) as jitted fixed-shape loops.

Replaces HF ``model.generate`` in the reference's per-epoch decode eval
(reference: sld/.../run_clm.py:647-739 — left-padded prompts, beam decode to
block_size, early stopping). TPU design: one compiled program — prefill the
whole prompt into a static KV cache, then lax.while_loop one token at a time;
beam search keeps a flattened (B * num_beams) cache and gathers it on beam
reordering.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from spokennlp_tpu.models.gpt2 import GPT2Config, GPT2LMModel, init_cache

Array = jax.Array
NEG_INF = -1e9


def _prompt_position_ids(attention_mask: Array) -> Array:
    """Left-padded prompts: positions count real tokens (pads get 0)."""
    am = attention_mask.astype(jnp.int32)
    return jnp.clip(jnp.cumsum(am, axis=1) - 1, 0, None) * am


@partial(jax.jit, static_argnames=("model", "max_len", "eos_id"))
def greedy_generate(
    model: GPT2LMModel,
    params,
    input_ids: Array,
    attention_mask: Array,
    max_len: int,
    eos_id: int,
) -> Array:
    """Greedy decode. input_ids (B, P) LEFT-padded; returns (B, max_len)
    where [:, :P] is the prompt and generation continues to max_len (eos
    repeats once a row finishes)."""
    B, P = input_ids.shape
    cfg = model.config
    cache = init_cache(cfg, B, max_len)

    am_full = jnp.zeros((B, max_len), jnp.int32)
    am_full = jax.lax.dynamic_update_slice(am_full, attention_mask.astype(jnp.int32), (0, 0))
    pos_ids = _prompt_position_ids(attention_mask)

    out = model.apply(
        {"params": params},
        input_ids,
        attention_mask=am_full,
        position_ids=pos_ids,
        cache=cache,
        cache_index=0,
        deterministic=True,
    )
    cache = out["cache"]
    next_tok = jnp.argmax(out["logits"][:, -1, :], axis=-1)  # (B,)
    n_real = attention_mask.astype(jnp.int32).sum(axis=1)  # per-row token count

    seqs = jnp.zeros((B, max_len), jnp.int32)
    seqs = jax.lax.dynamic_update_slice(seqs, input_ids.astype(jnp.int32), (0, 0))
    finished = next_tok == eos_id

    def body(state):
        t, seqs, cache, am_full, next_tok, n_real, finished = state
        tok = jnp.where(finished, eos_id, next_tok)
        seqs = seqs.at[:, t].set(tok)
        am_full = am_full.at[:, t].set(1)
        out = model.apply(
            {"params": params},
            tok[:, None],
            attention_mask=am_full,
            position_ids=n_real[:, None],
            cache=cache,
            cache_index=t,
            deterministic=True,
        )
        nxt = jnp.argmax(out["logits"][:, -1, :], axis=-1)
        finished = finished | (nxt == eos_id)
        return t + 1, seqs, out["cache"], am_full, nxt, n_real + 1, finished

    def cond(state):
        t = state[0]
        finished = state[6]
        return (t < max_len) & ~jnp.all(finished)

    state = (P, seqs, cache, am_full, next_tok, n_real, finished)
    t, seqs, _, _, next_tok, _, finished = jax.lax.while_loop(cond, body, state)
    # flush the pending prediction: the body writes the PREVIOUS step's token,
    # so when the loop exits because every row finished, the token that
    # finished the last row(s) — the eos itself — was never written. Without
    # this, downstream consumers see the zero-initialized tail instead of eos
    # (caught by the SLD parity harness: text_end dropped => WER blow-up).
    t_w = jnp.minimum(t, max_len - 1)
    pending = jnp.where(finished, eos_id, next_tok)
    keep = jax.lax.dynamic_slice_in_dim(seqs, t_w, 1, axis=1)[:, 0]
    seqs = seqs.at[:, t_w].set(jnp.where(t < max_len, pending, keep))
    return seqs


@partial(jax.jit, static_argnames=("model", "max_len", "eos_id", "num_beams"))
def beam_generate(
    model: GPT2LMModel,
    params,
    input_ids: Array,
    attention_mask: Array,
    max_len: int,
    eos_id: int,
    num_beams: int = 4,
    length_penalty: float = 1.0,
) -> Array:
    """Beam search; returns the best beam per row, (B, max_len)."""
    B, P = input_ids.shape
    K = num_beams
    cfg = model.config
    V = cfg.vocab_size

    # flatten beams into batch
    rep = lambda x: jnp.repeat(x, K, axis=0)
    ids_f = rep(input_ids)  # (B*K, P)
    am_f = rep(attention_mask.astype(jnp.int32))

    cache = init_cache(cfg, B * K, max_len)
    am_full = jnp.zeros((B * K, max_len), jnp.int32)
    am_full = jax.lax.dynamic_update_slice(am_full, am_f, (0, 0))
    pos_ids = _prompt_position_ids(am_f)
    out = model.apply(
        {"params": params},
        ids_f,
        attention_mask=am_full,
        position_ids=pos_ids,
        cache=cache,
        cache_index=0,
        deterministic=True,
    )
    cache = out["cache"]
    logp0 = jax.nn.log_softmax(out["logits"][:, -1, :], axis=-1)  # (B*K, V)
    logp0 = logp0.reshape(B, K, V)

    # initialize: first expansion from beam 0 only
    first = logp0[:, 0, :]  # (B, V)
    top_lp, top_tok = jax.lax.top_k(first, K)  # (B, K)
    scores = top_lp  # (B, K)
    next_tok = top_tok

    seqs = jnp.zeros((B, K, max_len), jnp.int32)
    seqs = seqs.at[:, :, :P].set(ids_f.reshape(B, K, P))
    finished = next_tok == eos_id
    n_real = am_f.reshape(B, K, -1).sum(axis=-1)

    def body(state):
        t, seqs, cache, am_full, next_tok, n_real, scores, finished = state
        tok = jnp.where(finished, eos_id, next_tok)  # (B, K)
        seqs = seqs.at[:, :, t].set(tok)
        am_full = am_full.at[:, t].set(1)
        out = model.apply(
            {"params": params},
            tok.reshape(B * K, 1),
            attention_mask=am_full,
            position_ids=n_real.reshape(B * K, 1),
            cache=cache,
            cache_index=t,
            deterministic=True,
        )
        cache = out["cache"]
        logp = jax.nn.log_softmax(out["logits"][:, -1, :], -1).reshape(B, K, V)
        # finished beams may only extend with eos at zero cost
        eos_only = jnp.full((V,), NEG_INF).at[eos_id].set(0.0)
        logp = jnp.where(finished[..., None], eos_only[None, None, :], logp)
        cand = scores[..., None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)  # (B, K)
        beam_idx = idx // V
        tok_idx = idx % V

        # reorder beam state
        def gather_beams(x):
            xk = x.reshape(B, K, *x.shape[1:])
            g = jnp.take_along_axis(
                xk, beam_idx.reshape(B, K, *([1] * (xk.ndim - 2))), axis=1
            )
            return g.reshape(B * K, *x.shape[1:])

        cache = jax.tree_util.tree_map(gather_beams, cache)
        am_full = gather_beams(am_full)
        seqs = jnp.take_along_axis(seqs, beam_idx[..., None], axis=1)
        n_real = jnp.take_along_axis(n_real, beam_idx, axis=1)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        # freeze each beam's length when it finishes so the length penalty can
        # differentiate hypotheses that ended at different steps (HF
        # normalizes each hypothesis by its own length at finish time); the
        # step that emits EOS still counts, later eos-padding steps do not.
        still_going = ~finished
        finished = finished | (tok_idx == eos_id)
        return (
            t + 1,
            seqs,
            cache,
            am_full,
            tok_idx,
            n_real + still_going.astype(n_real.dtype),
            new_scores,
            finished,
        )

    def cond(state):
        t = state[0]
        finished = state[7]
        return (t < max_len) & ~jnp.all(finished)

    state = (P, seqs, cache, am_full, next_tok, n_real, scores, finished)
    t, seqs, _, _, next_tok, n_real, scores, finished = jax.lax.while_loop(
        cond, body, state
    )
    # flush the pending prediction (same off-by-one as greedy: the body
    # writes the PREVIOUS step's token, so the eos that finished the last
    # beam(s) is dropped when the loop exits)
    t_w = jnp.minimum(t, max_len - 1)
    pending = jnp.where(finished, eos_id, next_tok)  # (B, K)
    keep = jax.lax.dynamic_slice_in_dim(seqs, t_w, 1, axis=2)[:, :, 0]
    seqs = seqs.at[:, :, t_w].set(jnp.where(t < max_len, pending, keep))

    norm = jnp.power(n_real.astype(jnp.float32), length_penalty)
    best = jnp.argmax(scores / jnp.maximum(norm, 1.0), axis=1)  # (B,)
    return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0, :]
