"""MMVTS objectives: weighted ts CE + modality alignment + topic contrastive.

Fixed-shape reimplementation of the reference LossLayer stack (reference:
mmvts/src/models/modules/loss_layer.py:7-118 and
contrastive_learning_layer.py:26-295). The reference flattens ragged
valid-clip features across the batch; here every loss runs on the padded
(B, K) clip grid with a mask.

Label convention (MMVTS): clip label 1 = END of topic (config.label_eot = 1)
— note this is INVERTED from the emnlp2023 B-EOP=0 scheme.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from spokennlp_tpu.ops.losses import cross_entropy_with_ignore, ts_class_weights

Array = jax.Array
IGNORE = -100
EPS = 1e-8
LABEL_EOT = 1


def _l2_normalize(x: Array) -> Array:
    """Zero-safe cosine normalization.

    ``x / (norm(x) + eps)`` has a NaN GRADIENT at x == 0 (d|x|/dx = x/|x|),
    and exactly-zero rows are real here: padded clips carry zero features,
    and LayerNorm of a constant vector is exactly 0 at init (beta = 0) — so
    the first backward pass of any run with padded clip grids NaN'd the
    whole fusion tree (caught by the MMVTS e2e parity harness). rsqrt of
    the +eps'd square sum is finite everywhere."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + EPS * EPS)


def ts_loss(
    logits: Array, clip_labels: Array, clip_mask: Array, weight_label_zero: float = 0.5
) -> Array:
    """CE over valid clips (loss_layer.py:14-23)."""
    labels = jnp.where(clip_mask.astype(bool), clip_labels, IGNORE)
    return cross_entropy_with_ignore(
        logits, labels, class_weights=ts_class_weights(weight_label_zero)
    )


def modality_cl_loss(
    feats_a: Array, feats_b: Array, clip_mask: Array, temp: float = 0.1
) -> Array:
    """Clip-aligned InfoNCE: matching clips across modalities are positives
    (contrastive_learning_layer.py:26-37). Flattens valid clips batch-wide."""
    B, K, H = feats_a.shape
    a = feats_a.reshape(B * K, H).astype(jnp.float32)
    b = feats_b.reshape(B * K, H).astype(jnp.float32)
    valid = clip_mask.reshape(B * K).astype(bool)

    an = _l2_normalize(a)
    bn = _l2_normalize(b)
    sim = (an @ bn.T) / temp
    exp_sim = jnp.where(valid[None, :], jnp.exp(sim), 0.0)
    numerator = jnp.exp(jnp.sum(an * bn, axis=-1) / temp) + EPS
    denominator = exp_sim.sum(axis=1) + EPS
    losses = -jnp.log(numerator / denominator)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, losses, 0.0).sum() / n


def _flat_topic_ids(clip_labels: Array, clip_mask: Array):
    """Global topic ids over the flattened valid clips; each sample's LAST
    valid clip is forced to close its topic (TopicContrastiveLearning.
    get_valid_labels:45-58)."""
    B, K = clip_labels.shape
    valid = clip_mask.astype(bool)
    n_valid = valid.astype(jnp.int32).sum(axis=1)
    last_idx = jnp.maximum(n_valid - 1, 0)
    is_last = (jnp.arange(K)[None, :] == last_idx[:, None]) & valid
    labels = jnp.where(is_last, LABEL_EOT, clip_labels)
    is_eot = valid & (labels == LABEL_EOT)
    within = jnp.cumsum(is_eot.astype(jnp.int32), axis=1) - is_eot.astype(jnp.int32)
    n_topics = is_eot.astype(jnp.int32).sum(axis=1)
    offsets = jnp.cumsum(n_topics) - n_topics
    ids = jnp.where(valid, within + offsets[:, None], -1)
    return ids, valid


def topic_cl_matrix_loss(
    fused: Array, clip_labels: Array, clip_mask: Array, temp: float = 0.1
) -> Array:
    """Matrix-mode topic contrastive loss (matrix_type_loss:85-101):
    positives = same-topic pairs, denominator = all valid pairs minus the
    diagonal; mean of -log((num + eps) / (den + eps)) over valid rows."""
    B, K, H = fused.shape
    ids, valid = _flat_topic_ids(clip_labels, clip_mask)
    f = fused.reshape(B * K, H).astype(jnp.float32)
    flat_ids = ids.reshape(-1)
    flat_valid = valid.reshape(-1)
    fn = _l2_normalize(f)
    sim = (fn @ fn.T) / temp
    M = B * K
    eye = jnp.eye(M, dtype=bool)
    pair_valid = flat_valid[:, None] & flat_valid[None, :] & ~eye
    same = pair_valid & (flat_ids[:, None] == flat_ids[None, :])
    exp_sim = jnp.exp(sim)
    numerator = jnp.where(same, exp_sim, 0.0).sum(axis=1) + EPS
    denominator = jnp.where(pair_valid, exp_sim, 0.0).sum(axis=1) + EPS
    losses = -jnp.log(numerator / denominator)
    n = jnp.maximum(flat_valid.sum(), 1)
    return jnp.where(flat_valid, losses, 0.0).sum() / n


def build_topic_cl_list_indices(
    clip_labels: "np.ndarray",
    clip_mask: "np.ndarray",
    pos_k: int,
    neg_k: int,
    choice: str = "random",
    rng=None,
):
    """Host-side anchor/pos/neg sampling for LIST-mode topic CL (reference:
    contrastive_learning_layer.py list_type_loss + select_pos/neg_features,
    :165-295). The reference samples with python `random` inside forward;
    here sampling happens in the data pipeline (like data/cssl_sampling.py)
    and the device loss is a fixed-shape gather.

    Semantics preserved: each sample's last valid clip closes its topic;
    anchors = every clip of every topic with >1 clip; positives from the
    anchor's topic ("random" or distance-ordered "near"), negatives from
    other topics ("random", or the following/preceding topics for "near"),
    both padded by repetition. If the whole batch has <2 topics no anchor is
    valid (the reference returns 0 loss).

    Returns dict of numpy arrays, flat indices into the (B*K) clip grid:
      anchor_valid (B*K,), pos (pos_k, B*K), neg (neg_k, B*K).
    """
    import numpy as np

    B, K = clip_labels.shape
    M = B * K
    anchor_valid = np.zeros(M, np.int32)
    pos = np.zeros((pos_k, M), np.int32)
    neg = np.zeros((neg_k, M), np.int32)
    rng = rng or np.random.default_rng(0)

    # flatten valid clips in order; force each sample's last valid clip = EOT
    flat_pos: list = []  # valid-seq index -> flat (B*K) index
    labels_seq: list = []
    for b in range(B):
        ks = [k for k in range(K) if clip_mask[b, k]]
        for j, k in enumerate(ks):
            flat_pos.append(b * K + k)
            lab = LABEL_EOT if j == len(ks) - 1 else int(clip_labels[b, k])
            labels_seq.append(lab)
    if not labels_seq:
        return {"anchor_valid": anchor_valid, "pos": pos, "neg": neg}

    # locate topics over the valid sequence: [start, end) spans
    topics = []
    start = 0
    for i, l in enumerate(labels_seq):
        if l == LABEL_EOT:
            topics.append((start, i + 1))
            start = i + 1
    if len(topics) < 2:
        return {"anchor_valid": anchor_valid, "pos": pos, "neg": neg}

    def pad_pick(cands, n):
        cands = list(cands)
        while len(cands) < n:
            cands.append(cands[int(rng.integers(0, len(cands)))])
        if choice == "random":
            sel = rng.permutation(len(cands))[:n]
            return [cands[i] for i in sel]
        return cands[:n]

    for t_idx, (s, e) in enumerate(topics):
        if e - s < 2:
            continue  # single-clip topic: no positives, not an anchor
        for a in range(s, e):
            fa = flat_pos[a]
            anchor_valid[fa] = 1
            if choice == "near":
                left = list(range(a - 1, s - 1, -1))
                right = list(range(a + 1, e))
                merged = []
                for x, y in zip(left, right):
                    merged += [x, y]
                merged += right[len(left):] if len(left) < len(right) else left[len(right):]
                pos_c = merged
            else:
                pos_c = list(range(s, a)) + list(range(a + 1, e))
            for i, idx in enumerate(pad_pick(pos_c, pos_k)):
                pos[i, fa] = flat_pos[idx]
            if choice == "near":
                if t_idx < len(topics) - 1:
                    neg_c = list(range(topics[t_idx + 1][0], topics[-1][1]))
                else:
                    neg_c = list(range(topics[t_idx - 1][1] - 1, -1, -1))
            else:
                neg_c = [
                    i
                    for o, (os_, oe) in enumerate(topics)
                    if o != t_idx
                    for i in range(os_, oe)
                ]
            for i, idx in enumerate(pad_pick(neg_c, neg_k)):
                neg[i, fa] = flat_pos[idx]
    return {"anchor_valid": anchor_valid, "pos": pos, "neg": neg}


def topic_cl_list_loss(
    fused: Array,
    indices: Dict[str, Array],
    temp: float = 0.1,
    fct: str = "simcse",
) -> Array:
    """Device side of list-mode topic CL (anchor_cl_loss, :127-163):
    per anchor, 'simcse' = -log(sum exp(pos/T) / (sum exp(pos/T + neg/T)));
    'ce' = BCE-with-logits on raw cosine sims (1 = positive). Mean over
    valid anchors; 0 when none."""
    B, K, H = fused.shape
    f = fused.reshape(B * K, H).astype(jnp.float32)
    fn = _l2_normalize(f)
    valid = indices["anchor_valid"].astype(bool)  # (M,)

    def sims(idx):  # (n, M) -> (n, M) cosine per anchor
        g = fn[idx]  # (n, M, H)
        return jnp.sum(fn[None, :, :] * g, axis=-1)

    pos_sim = sims(indices["pos"])  # (pos_k, M)
    neg_sim = sims(indices["neg"])  # (neg_k, M)
    if fct == "simcse":
        pos_e = jnp.exp(pos_sim / temp).sum(axis=0)
        neg_e = jnp.exp(neg_sim / temp).sum(axis=0)
        losses = -jnp.log(pos_e / (pos_e + neg_e) + EPS)
    elif fct == "ce":
        def bce(sim, label):
            return jnp.log1p(jnp.exp(-sim)) + (1 - label) * sim
        losses = (
            bce(pos_sim, 1.0).sum(axis=0) + bce(neg_sim, 0.0).sum(axis=0)
        ) / (pos_sim.shape[0] + neg_sim.shape[0])
    else:
        raise ValueError(fct)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, losses, 0.0).sum() / n


def mmvts_total_loss(
    cfg,
    outputs: Dict[str, Array],
    clip_labels: Array,
    clip_mask: Array,
    *,
    weight_label_zero: float = 0.5,
    ts_lw: float = 1.0,
    do_modality_cl: bool = False,
    modality_cl_lw: float = 1.0,
    align_pairs: Dict[str, float] = None,
    align_before_fuse: bool = True,
    cl_temp: float = 0.1,
    do_topic_mm_cl: bool = False,
    topic_mm_cl_lw: float = 1.0,
    topic_cl_type: str = "matrix",
    topic_cl_fct: str = "simcse",
    topic_cl_indices: Optional[Dict[str, Array]] = None,
):
    """Assemble the composite loss (loss_layer.py:68-118). ``align_pairs``
    maps pair names ("av", "at", "tv") to weights."""
    aux: Dict[str, Array] = {}
    total = ts_lw * ts_loss(
        outputs["logits"], clip_labels, clip_mask, weight_label_zero
    )
    aux["ts_loss"] = total

    if do_modality_cl:
        feats = outputs["projected"] if align_before_fuse else outputs["features"]
        pair_feats = {
            "av": ("audio", "vis"),
            "at": ("audio", "text"),
            "tv": ("text", "vis"),
        }
        m_loss = 0.0
        for pair, w in (align_pairs or {}).items():
            a, b = pair_feats[pair]
            if a in feats and b in feats:
                l = w * modality_cl_loss(feats[a], feats[b], clip_mask, cl_temp)
                aux[f"{pair}_cl_loss"] = l
                m_loss = m_loss + l
        m_loss = modality_cl_lw * m_loss
        aux["modality_cl_loss"] = m_loss
        total = total + m_loss

    if do_topic_mm_cl:
        if topic_cl_type == "list":
            assert topic_cl_indices is not None, (
                "list-mode topic CL needs host-sampled indices "
                "(build_topic_cl_list_indices in the data pipeline)"
            )
            t_loss = topic_mm_cl_lw * topic_cl_list_loss(
                outputs["fused"], topic_cl_indices, cl_temp, topic_cl_fct
            )
        else:
            t_loss = topic_mm_cl_lw * topic_cl_matrix_loss(
                outputs["fused"], clip_labels, clip_mask, cl_temp
            )
        aux["topic_mm_cl_loss"] = t_loss
        total = total + t_loss

    if outputs.get("moe_loss") is not None:
        aux["moe_loss"] = outputs["moe_loss"]
        total = total + outputs["moe_loss"]

    aux["total_loss"] = total
    return total, aux
