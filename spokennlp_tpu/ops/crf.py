"""Linear-chain CRF: log-likelihood (forward algorithm) + Viterbi decode.

Backs the Bert-CRF keyphrase tagger of MUG Track 4, which the reference
delegates to the external AdaSeq repo (reference: alimeeting4mug/src/
keyphrase_extraction/README.md:13-23). Both passes are lax.scan programs —
static shapes, mask-gated updates, no host control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e9


def crf_log_likelihood(
    emissions: Array,  # (B, L, T) log potentials
    tags: Array,  # (B, L) int
    mask: Array,  # (B, L) 1 = valid; position 0 must be valid
    transitions: Array,  # (T, T): transitions[i, j] = score of i -> j
) -> Array:
    """Mean log-likelihood log p(tags | emissions) over the batch."""
    score = _sequence_score(emissions, tags, mask, transitions)
    log_z = _log_partition(emissions, mask, transitions)
    return jnp.mean(score - log_z)


def _sequence_score(emissions, tags, mask, transitions):
    B, L, T = emissions.shape
    maskf = mask.astype(jnp.float32)
    em = jnp.take_along_axis(emissions, tags[..., None], axis=-1)[..., 0]  # (B, L)
    em_score = (em * maskf).sum(axis=1)
    trans = transitions[tags[:, :-1], tags[:, 1:]]  # (B, L-1)
    trans_score = (trans * maskf[:, 1:]).sum(axis=1)
    return em_score + trans_score


def _log_partition(emissions, mask, transitions):
    B, L, T = emissions.shape
    alpha = emissions[:, 0, :]  # (B, T)

    def step(alpha, x):
        em_t, mask_t = x  # (B, T), (B,)
        # next_alpha[j] = logsumexp_i(alpha[i] + trans[i, j]) + em[j]
        scores = alpha[:, :, None] + transitions[None, :, :]
        new = jax.nn.logsumexp(scores, axis=1) + em_t
        alpha = jnp.where(mask_t[:, None].astype(bool), new, alpha)
        return alpha, None

    xs = (jnp.moveaxis(emissions[:, 1:], 1, 0), jnp.moveaxis(mask[:, 1:], 1, 0))
    alpha, _ = jax.lax.scan(step, alpha, xs)
    return jax.nn.logsumexp(alpha, axis=-1)


def crf_viterbi_decode(
    emissions: Array, mask: Array, transitions: Array
) -> Tuple[Array, Array]:
    """Best tag path per sequence. Returns (tags (B, L), score (B,)).

    Invalid positions carry the last valid tag forward (callers mask them).
    """
    B, L, T = emissions.shape
    alpha = emissions[:, 0, :]

    def fwd(alpha, x):
        em_t, mask_t = x
        scores = alpha[:, :, None] + transitions[None, :, :]  # (B, T, T)
        best_prev = jnp.argmax(scores, axis=1)  # (B, T)
        new = jnp.max(scores, axis=1) + em_t
        keep = mask_t[:, None].astype(bool)
        alpha_out = jnp.where(keep, new, alpha)
        # for masked steps the backpointer is identity
        ident = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        bp = jnp.where(keep, best_prev, ident)
        return alpha_out, bp

    xs = (jnp.moveaxis(emissions[:, 1:], 1, 0), jnp.moveaxis(mask[:, 1:], 1, 0))
    alpha, bps = jax.lax.scan(fwd, alpha, xs)  # bps: (L-1, B, T)
    best_last = jnp.argmax(alpha, axis=-1)  # (B,)
    best_score = jnp.max(alpha, axis=-1)

    def bwd(tag, bp):
        prev = jnp.take_along_axis(bp, tag[:, None], axis=1)[:, 0]
        return prev, tag  # emit the tag at position i+1 for bps[i]

    # reverse scan: ys[i] = tag at time i+1; final carry = tag at time 0
    first_tag, tags_tail = jax.lax.scan(bwd, best_last, bps, reverse=True)
    tags = jnp.concatenate(
        [first_tag[:, None], jnp.moveaxis(tags_tail, 0, 1)], axis=1
    )
    return tags, best_score
