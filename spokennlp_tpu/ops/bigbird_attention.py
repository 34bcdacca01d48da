"""BigBird-style block-sparse attention, TPU-native.

The reference's fourth topic-seg backbone wraps HF BigBird
(reference: emnlp2023-topic_segmentation/src/models/bigbird_for_ts.py:1-113,
selected by model-name substring at src/ts_sentence_seq_labeling.py:233-246).
Pattern (ITC variant): every query block attends to its own + adjacent
blocks (sliding), the first ``num_global_blocks`` blocks (global keys),
and ``num_random_blocks`` random blocks; global-block QUERIES attend to
everything and are attended by everything.

TPU-first design: no data-dependent shapes. The random block assignment is
drawn host-side from a seeded RNG (the reference's HF implementation also
fixes randomness per forward via a seed) and becomes a STATIC (nq, K)
gather-index table baked into the compiled program:

  - block path (long L): gather k/v blocks by static indices ->
    (B, nq, K*b) keys per (b)-token query block -> masked softmax -> AV.
    O(L * K * b) memory instead of O(L^2); all gathers static.
  - bias path / oracle: materialize the (L, L) additive mask and reuse the
    dense einsum attention (exact semantics twin of the block path, used
    for tests and short sequences).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9


def bigbird_block_indices(
    num_blocks: int,
    num_global_blocks: int = 2,
    num_random_blocks: int = 3,
    seed: int = 0,
) -> np.ndarray:
    """Static (num_blocks, K) key-block index table.

    K = num_global + 3 (prev/self/next, clamped at edges) + num_random.
    Random blocks are drawn per query block without replacement from the
    non-global, non-window blocks (falling back to the window blocks when
    the sequence is too short to have enough candidates).
    """
    g, r = num_global_blocks, num_random_blocks
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(num_blocks):
        window = [max(i - 1, 0), i, min(i + 1, num_blocks - 1)]
        fixed = list(range(min(g, num_blocks))) + window
        cand = [
            b
            for b in range(num_blocks)
            if b not in fixed
        ]
        take = min(r, len(cand))
        rand = list(rng.choice(cand, size=take, replace=False)) if take else []
        # pad with self so the row is fixed-width (duplicates are harmless:
        # the mask dedups nothing but softmax normalizes over allowed keys —
        # duplicated blocks are masked below via a first-occurrence mask)
        while len(rand) < r:
            rand.append(i)
        rows.append(fixed + rand)
    return np.asarray(rows, np.int32)  # (nq, g + 3 + r)


def _first_occurrence_mask(indices: np.ndarray) -> np.ndarray:
    """(nq, K) bool: True where this column is the first occurrence of the
    block id in its row (so duplicated blocks don't double-count keys)."""
    nq, K = indices.shape
    mask = np.zeros((nq, K), bool)
    for i in range(nq):
        seen = set()
        for j in range(K):
            b = int(indices[i, j])
            if b not in seen:
                seen.add(b)
                mask[i, j] = True
    return mask


def bigbird_attention_bias(
    attention_mask: Array,  # (B, L) 1 = real
    block_size: int,
    num_global_blocks: int = 2,
    num_random_blocks: int = 3,
    seed: int = 0,
    neg_inf: float = NEG_INF,
) -> Array:
    """(B, 1, L, L) additive bias materializing the BigBird pattern (oracle
    + short-sequence path; exact twin of the block path)."""
    B, L = attention_mask.shape
    assert L % block_size == 0, (L, block_size)
    nb = L // block_size
    idx = bigbird_block_indices(nb, num_global_blocks, num_random_blocks, seed)
    allowed_blocks = np.zeros((nb, nb), bool)
    for i in range(nb):
        allowed_blocks[i, idx[i]] = True
    # global rows/cols dense
    G = min(num_global_blocks, nb)
    allowed_blocks[:G, :] = True
    allowed_blocks[:, :G] = True
    allowed = np.kron(allowed_blocks, np.ones((block_size, block_size), bool))
    bias = jnp.where(jnp.asarray(allowed)[None, None], 0.0, neg_inf)
    key_pad = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg_inf
    return bias + key_pad


def bigbird_block_sparse_attention(
    q: Array,  # (B, L, nh, hd)
    k: Array,
    v: Array,
    attention_mask: Array,  # (B, L)
    block_size: int,
    num_global_blocks: int = 2,
    num_random_blocks: int = 3,
    seed: int = 0,
    softmax_dtype=jnp.float32,
) -> Array:
    """O(L * K * block) BigBird attention; returns (B, L, nh, hd).

    Matches bigbird_attention_bias + dense softmax exactly (tested oracle).
    """
    B, L, nh, hd = q.shape
    assert L % block_size == 0, (L, block_size)
    nb = L // block_size
    bsz = block_size
    G = min(num_global_blocks, nb)
    idx_np = bigbird_block_indices(nb, G, num_random_blocks, seed)
    occ_np = _first_occurrence_mask(idx_np)
    idx = jnp.asarray(idx_np)  # (nq, K)
    occ = jnp.asarray(occ_np)
    K = idx.shape[1]

    scale = 1.0 / float(hd) ** 0.5
    qb = q.reshape(B, nb, bsz, nh, hd)
    kb = k.reshape(B, nb, bsz, nh, hd)
    vb = v.reshape(B, nb, bsz, nh, hd)
    mb = attention_mask.reshape(B, nb, bsz)

    # gather key/value blocks per query block: (B, nq, K, b, nh, hd)
    kg = jnp.take(kb, idx.reshape(-1), axis=1).reshape(B, nb, K, bsz, nh, hd)
    vg = jnp.take(vb, idx.reshape(-1), axis=1).reshape(B, nb, K, bsz, nh, hd)
    mg = jnp.take(mb, idx.reshape(-1), axis=1).reshape(B, nb, K, bsz)

    # scores: (B, nh, nq, b, K*b)
    scores = jnp.einsum(
        "bqind,bqkjnd->bnqikj", qb * scale, kg
    ).reshape(B, nh, nb, bsz, K * bsz)
    live = (mg.astype(bool) & occ[None, :, :, None]).reshape(B, 1, nb, 1, K * bsz)
    scores = jnp.where(live, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1).astype(q.dtype)
    ctx = jnp.einsum(
        "bnqim,bqmnd->bqind",
        probs,
        vg.reshape(B, nb, K * bsz, nh, hd),
    ).reshape(B, L, nh, hd)

    # global query rows: dense attention over all keys, overwrite first G*b
    if G > 0:
        Lg = G * bsz
        qg = q[:, :Lg]
        g_scores = jnp.einsum("blnd,bmnd->bnlm", qg * scale, k)
        pad = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        g_scores = g_scores + pad.astype(g_scores.dtype)
        g_probs = jax.nn.softmax(g_scores.astype(softmax_dtype), -1).astype(q.dtype)
        g_ctx = jnp.einsum("bnlm,bmnd->blnd", g_probs, v)
        ctx = jnp.concatenate([g_ctx, ctx[:, Lg:]], axis=1)
    return ctx


def reference_bigbird_attention(
    q, k, v, attention_mask, block_size,
    num_global_blocks=2, num_random_blocks=3, seed=0,
):
    """Dense oracle: softmax over the materialized (L, L) bias."""
    bias = bigbird_attention_bias(
        attention_mask, block_size, num_global_blocks, num_random_blocks, seed
    )
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    scores = jnp.einsum("blnd,bmnd->bnlm", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnlm,bmnd->blnd", probs.astype(v.dtype), v)
