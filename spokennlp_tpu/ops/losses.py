"""Masked classification losses (fixed-shape, jit-friendly).

Replaces the reference's torch loss factory (reference:
emnlp2023-topic_segmentation/src/models/modules/utils.py:141-182) with pure
jnp functions. Ignored positions are handled by masking, never by dynamic
shapes, so everything compiles to static XLA programs.

Reduction semantics are matched to the reference exactly:
  - plain / weighted CE: sum(w_i * ce_i) / sum(w_i) over VALID positions
    (torch CrossEntropyLoss 'mean' with ignore_index).
  - focal loss: mean over ALL positions including ignored ones (the reference
    FocalLoss calls ``torch.mean`` on a vector where ignored entries are 0 —
    utils.py:150-170). Kept bit-for-bit so training curves are comparable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

IGNORE = -100


def cross_entropy_with_ignore(
    logits: Array,
    labels: Array,
    class_weights: Optional[Array] = None,
    focal_gamma: float = 0.0,
    ignore_id: int = IGNORE,
) -> Array:
    """Scalar CE loss over positions whose label != ignore_id.

    Args:
      logits: (..., C) float.
      labels: (...,) int.
      class_weights: optional (C,) per-class weights.
      focal_gamma: if > 0, apply the focal modulation (1 - p_true)^gamma.
    """
    num_classes = logits.shape[-1]
    logits = logits.reshape(-1, num_classes).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_id
    safe_labels = jnp.where(valid, labels, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]

    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(ce)
    ce = ce * w
    ce = jnp.where(valid, ce, 0.0)

    if focal_gamma != 0.0:
        p_true = jnp.exp(
            jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
        )
        focal = jnp.power(1.0 - p_true, focal_gamma)
        ce = jnp.where(valid, focal * ce, 0.0)
        # reference FocalLoss: mean over ALL positions (incl. ignored zeros)
        return jnp.mean(ce)

    denom = jnp.where(valid, w, 0.0).sum()
    return ce.sum() / jnp.maximum(denom, 1e-12)


def bce_with_logits_ignore(
    logits: Array, labels: Array, ignore_id: int = IGNORE
) -> Array:
    """Mean binary cross-entropy with logits over valid positions."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_id
    y = jnp.where(valid, labels, 0).astype(jnp.float32)
    # numerically stable BCE-with-logits
    loss = jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = jnp.where(valid, loss, 0.0)
    return loss.sum() / jnp.maximum(valid.sum(), 1)


def ts_class_weights(weight_label_zero: float) -> Optional[jnp.ndarray]:
    """Class-weight vector for the 2-label topic-seg head.

    Reference: utils.py:173-177 — weights [w0, 1-w0] only when w0 != 0.5.
    """
    if weight_label_zero == 0.5:
        return None
    return jnp.asarray([weight_label_zero, 1.0 - weight_label_zero], jnp.float32)
