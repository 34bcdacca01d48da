"""Sliding-window (+ global token) attention structure for Longformer-style models.

The reference leans on HF's Longformer CUDA/torch implementation with CLS
global attention (reference: emnlp2023-topic_segmentation/src/models/
longformer_for_ts.py:55-58). Here the structure is expressed two ways:

1. ``sliding_window_attention_mask_bias`` — an additive (B, L, L) bias consumed
   by the dense einsum path. Exact, simple, and fine up to ~2k tokens; XLA
   fuses the bias add into the softmax.
2. a blocked Pallas kernel (ops/pallas/sliding_attention_kernel.py) for long
   sequences, which never materializes the (L, L) score matrix. The mask-bias
   path doubles as its correctness reference in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def sliding_window_attention_mask_bias(
    attention_mask: Array,
    window: int,
    global_mask: Optional[Array] = None,
    neg_inf: float = -1e9,
) -> Array:
    """Additive attention bias for sliding-window + global attention.

    Args:
      attention_mask: (B, L) 1 for real tokens, 0 for padding.
      window: total window size; each token attends to positions j with
        |i - j| <= window // 2 (Longformer convention of symmetric one-sided
        half-windows).
      global_mask: optional (B, L) 1 for global tokens (e.g. CLS). Global
        tokens attend to and are attended by every non-pad token.
      neg_inf: value used to mask disallowed pairs.

    Returns:
      (B, L, L) float32 bias: 0 where attention is allowed, ``neg_inf`` where not.
    """
    B, L = attention_mask.shape
    half = window // 2
    idx = jnp.arange(L, dtype=jnp.int32)
    in_window = jnp.abs(idx[:, None] - idx[None, :]) <= half  # (L, L)
    allowed = jnp.broadcast_to(in_window[None, :, :], (B, L, L))
    if global_mask is not None:
        g = global_mask.astype(bool)
        allowed = allowed | g[:, :, None] | g[:, None, :]
    valid_key = attention_mask.astype(bool)[:, None, :]
    allowed = allowed & valid_key
    return jnp.where(allowed, 0.0, neg_inf).astype(jnp.float32)
