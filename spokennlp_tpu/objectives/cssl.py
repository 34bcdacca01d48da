"""CSSL — contrastive semantic similarity learning, fixed-shape on device.

Reimplements the reference CSSL module (reference: emnlp2023-topic_segmentation/
src/models/modules/cssl.py:11-274) with a TPU-first formulation:

- the reference extracts "EOP features" through a scatter_reduce(amax) whose
  segment ids isolate single BOS tokens (cssl.py:17-19, 242-248) — i.e. it is
  a gather of BOS-position hidden states. Here the featurizer emits padded
  gather indices and the device does one fixed-shape ``take_along_axis``.
- topic ids (cssl.py:250-262: a Python loop over ragged label lists) become a
  masked exclusive cumsum over the padded (B, K) eop grid plus per-example
  offsets, so the whole thing stays inside jit.
- ``eop_list`` / ``eot_list`` random positive/negative sampling (cssl.py:
  118-228) is host-side (data/cssl_sampling.py) because it only depends on
  labels + RNG; the device consumes precomputed index tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

IGNORE = -100
LABEL_EOP = 0
LABEL_O = 1


def gather_sentence_features(seq_output: Array, positions: Array) -> Array:
    """Gather hidden states at sentence (BOS) positions.

    seq_output: (B, L, H); positions: (B, K) int -> (B, K, H).
    """
    return jnp.take_along_axis(seq_output, positions[..., None], axis=1)


def topic_segment_ids(eop_labels: Array, eop_mask: Array):
    """Assign a global topic id to every valid EOP slot.

    Replicates the reference's sequential id assignment across the whole batch
    (cssl.py:250-262): ids increase within an example after each label-0
    (B-EOP) sentence, and continue across examples; an example whose last
    valid label is O still closes its trailing topic.

    Args:
      eop_labels: (B, K) label ids at eop slots (garbage where mask == 0).
      eop_mask: (B, K) 1 for valid (label != IGNORE) eop slots, packed left.

    Returns:
      (ids, valid, num_topics_total): ids (B, K) int32 global topic ids
      (0 where invalid), valid (B, K) bool, total topic count ().
    """
    valid = eop_mask.astype(bool)
    is_eop = valid & (eop_labels == LABEL_EOP)
    # within-example exclusive cumsum of boundary indicators
    within = jnp.cumsum(is_eop.astype(jnp.int32), axis=1) - is_eop.astype(jnp.int32)

    n_valid = valid.astype(jnp.int32).sum(axis=1)  # (B,)
    last_idx = jnp.maximum(n_valid - 1, 0)
    last_label = jnp.take_along_axis(eop_labels, last_idx[:, None], axis=1)[:, 0]
    trailing_open = (n_valid > 0) & (last_label == LABEL_O)
    n_topics = is_eop.astype(jnp.int32).sum(axis=1) + trailing_open.astype(jnp.int32)

    offsets = jnp.cumsum(n_topics) - n_topics  # exclusive cumsum (B,)
    ids = within + offsets[:, None]
    ids = jnp.where(valid, ids, 0)
    return ids, valid, n_topics.sum()


def _l2_normalize(x):
    """Zero-safe cosine normalization: x/(max(|x|,eps)) still has a NaN
    GRADIENT at x == 0 (the 0/0 of d|x|/dx propagates through maximum's
    zero cotangent as 0*nan). rsqrt of the +eps'd square sum is finite
    everywhere (same fix as objectives/mmvts_losses.py)."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + 1e-16)


def pairwise_similarity(x: Array, y: Array, temp: float) -> Array:
    """Similarity matrix matching the reference Similarity module
    (utils.py:90-108): cosine / temp, or raw dot product when temp == 0."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if temp == 0:
        return x @ y.T
    xn = _l2_normalize(x)
    yn = _l2_normalize(y)
    return (xn @ yn.T) / temp


def eop_matrix_cl_loss(
    eop_features: Array,
    eop_labels: Array,
    eop_mask: Array,
    temp: float,
) -> Array:
    """Full-matrix InfoNCE with same-topic positives (cssl.py:21-73).

    eop_features: (B, K, H) gathered BOS features; invalid slots masked out.
    Returns a scalar; 0 when the batch has fewer than 2 topics or <= 2 eops
    (the reference's gate at cssl.py:263-264).
    """
    B, K, H = eop_features.shape
    ids, valid, _ = topic_segment_ids(eop_labels, eop_mask)

    feats = eop_features.reshape(B * K, H)
    flat_ids = ids.reshape(-1)
    flat_valid = valid.reshape(-1)
    M = B * K

    sim = pairwise_similarity(feats, feats, temp)  # (M, M)
    pair_valid = flat_valid[:, None] & flat_valid[None, :]
    same = (flat_ids[:, None] == flat_ids[None, :]) & pair_valid
    eye = jnp.eye(M, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = pair_valid & ~same

    exp_sim = jnp.exp(sim)
    numerator = jnp.sum(jnp.where(pos_mask, exp_sim, 0.0), axis=0)
    denominator = numerator + jnp.sum(jnp.where(neg_mask, exp_sim, 0.0), axis=0)

    prob = numerator / jnp.maximum(denominator, 1e-12)
    use = flat_valid & (numerator > 0)
    losses = -jnp.log(jnp.maximum(prob, 1e-12))
    n_use = jnp.maximum(use.sum(), 1)
    loss = jnp.where(use, losses, 0.0).sum() / n_use

    n_eops = flat_valid.sum()
    max_topic = jnp.max(jnp.where(flat_valid, flat_ids, 0))
    gate = (n_eops > 2) & (max_topic > 0)
    return jnp.where(gate, loss, 0.0)


def list_cl_loss(
    eop_features: Array,
    anchor_indices: Array,
    positive_indices: Array,
    negative_indices: Array,
    anchor_valid: Array,
    temp: float,
) -> Array:
    """List-mode InfoNCE with precomputed host-side sampling (cssl.py:82-167).

    Args:
      eop_features: (B, K, H); flattened to (B*K, H) for indexing.
      anchor_indices: (A,) flat indices of anchor features.
      positive_indices: (P, A) flat indices of positives per anchor.
      negative_indices: (N, A) flat indices of negatives per anchor.
      anchor_valid: (A,) 1 for live anchors (padding rows are 0).
      temp: similarity temperature (0 = dot product).
    """
    B, K, H = eop_features.shape
    feats = eop_features.reshape(B * K, H).astype(jnp.float32)

    anchors = feats[anchor_indices]  # (A, H)

    def sim_rows(idx):  # idx: (A,)
        other = feats[idx]
        if temp == 0:
            return jnp.sum(anchors * other, axis=-1)
        an = _l2_normalize(anchors)
        on = _l2_normalize(other)
        return jnp.sum(an * on, axis=-1) / temp

    pos_sim = jax.vmap(sim_rows)(positive_indices)  # (P, A)
    neg_sim = jax.vmap(sim_rows)(negative_indices)  # (N, A)

    exp_pos = jnp.exp(pos_sim)
    exp_neg = jnp.exp(neg_sim)
    numerator = exp_pos.sum(axis=0)
    denominator = numerator + exp_neg.sum(axis=0)
    losses = -jnp.log(jnp.maximum(numerator / jnp.maximum(denominator, 1e-12), 1e-12))

    av = anchor_valid.astype(jnp.float32)
    n = jnp.maximum(av.sum(), 1.0)
    return jnp.sum(losses * av) / n


def eop_pair_cosine_similarity(
    eop_features: Array,
    eop_labels: Array,
    eop_mask: Array,
    temp: float,
):
    """Cosine similarity between each labeled sentence and the next one.

    Reference: EopPairCosineSimilarity (utils.py:111-138) — the reference
    first COMPACTS the labeled features, then pairs compacted slot k with
    k+1 (wrapping to 0 at the end). eop_mask is usually a left-packed
    prefix, but window_document permits interior IGNORE sent_labels, so
    compaction is done here explicitly (stable argsort moves valid slots to
    the front, pairing runs on the compacted order, and the sims are
    scattered back to the original slots).

    Returns (sims, labels): (B, K) with IGNORE-filled invalid slots.
    """
    B, K, H = eop_features.shape
    valid = eop_mask.astype(bool)
    n_valid = eop_mask.astype(jnp.int32).sum(axis=1)  # (B,)
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]

    # compact: valid slots first, original relative order preserved
    order = jnp.argsort(jnp.logical_not(valid), axis=1, stable=True)  # (B, K)
    feats_c = jnp.take_along_axis(eop_features, order[..., None], axis=1)

    nxt = jnp.where(idx + 1 < n_valid[:, None], idx + 1, 0)
    next_feats = jnp.take_along_axis(feats_c, nxt[..., None], axis=1)

    a = feats_c.astype(jnp.float32)
    b = next_feats.astype(jnp.float32)
    an = _l2_normalize(a)
    bn = _l2_normalize(b)
    cos_c = jnp.sum(an * bn, axis=-1)  # (B, K), compacted order
    if temp != 0:
        cos_c = cos_c / temp

    # scatter back: original slot j holds the sim of its compacted position
    inv_order = jnp.argsort(order, axis=1)
    cos = jnp.take_along_axis(cos_c, inv_order, axis=1)

    sims = jnp.where(valid, cos, float(IGNORE))
    labels = jnp.where(valid, eop_labels, IGNORE)
    return sims, labels
