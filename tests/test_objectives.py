"""Tests for losses and CSSL/TSSP objectives.

Oracles are independent ragged-Python/numpy reimplementations of the
reference's torch semantics (emnlp2023-topic_segmentation/src/models/modules/
{cssl,utils,loss_calculator}.py), evaluated against the fixed-shape jit
formulations in spokennlp_tpu.objectives.
"""

import numpy as np
import jax.numpy as jnp

from spokennlp_tpu.objectives import cssl as C
from spokennlp_tpu.ops import losses as L
from spokennlp_tpu.data.cssl_sampling import batch_topic_structure

IGNORE = -100


# ---------------------------------------------------------------------------
# masked losses
# ---------------------------------------------------------------------------


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_cross_entropy_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(10, 2)).astype(np.float32)
    labels = np.array([0, 1, IGNORE, 0, 1, 1, IGNORE, 0, 1, 0])
    got = float(L.cross_entropy_with_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    p = _np_softmax(logits)
    valid = labels != IGNORE
    want = -np.log(p[np.arange(10)[valid], labels[valid]]).mean()
    assert abs(got - want) < 1e-6


def test_weighted_cross_entropy_matches_torch_semantics():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 2)).astype(np.float32)
    labels = np.array([0, 1, 1, IGNORE, 0, 1, 0, 1])
    w0 = 0.7
    got = float(
        L.cross_entropy_with_ignore(
            jnp.asarray(logits), jnp.asarray(labels), class_weights=L.ts_class_weights(w0)
        )
    )
    p = _np_softmax(logits)
    valid = labels != IGNORE
    wts = np.where(labels[valid] == 0, w0, 1 - w0)
    ce = -np.log(p[np.arange(8)[valid], labels[valid]])
    want = (wts * ce).sum() / wts.sum()  # torch weighted-mean semantics
    assert abs(got - want) < 1e-6


def test_focal_loss_mean_over_all_positions():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(6, 2)).astype(np.float32)
    labels = np.array([0, 1, IGNORE, 0, IGNORE, 1])
    gamma = 2.0
    got = float(
        L.cross_entropy_with_ignore(jnp.asarray(logits), jnp.asarray(labels), focal_gamma=gamma)
    )
    p = _np_softmax(logits)
    valid = labels != IGNORE
    safe = np.where(valid, labels, 0)
    pt = p[np.arange(6), safe]
    ce = -np.log(pt) * (1 - pt) ** gamma
    ce = np.where(valid, ce, 0.0)
    want = ce.mean()  # reference divides by ALL positions (utils.py:150-170)
    assert abs(got - want) < 1e-6


def test_bce_with_logits():
    logits = np.array([0.5, -1.0, 2.0, 3.0], dtype=np.float32)
    labels = np.array([1, 0, IGNORE, 1])
    got = float(L.bce_with_logits_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    sig = 1 / (1 + np.exp(-logits))
    want = -(
        np.log(sig[0]) + np.log(1 - sig[1]) + np.log(sig[3])
    ) / 3
    assert abs(got - want) < 1e-5


# ---------------------------------------------------------------------------
# topic segment ids
# ---------------------------------------------------------------------------


def _oracle_segment_ids(eop_labels, eop_mask):
    """Reference cssl.py:250-262 walk."""
    seg_id = 0
    out = []
    for b in range(eop_labels.shape[0]):
        ex = [int(l) for l, m in zip(eop_labels[b], eop_mask[b]) if m]
        if not ex:
            continue
        for l in ex:
            out.append(seg_id)
            if l == 0:
                seg_id += 1
        if ex[-1] == 1:
            seg_id += 1
    return out


def test_topic_segment_ids_matches_reference_walk():
    rng = np.random.default_rng(3)
    B, K = 4, 6
    eop_labels = rng.integers(0, 2, size=(B, K)).astype(np.int32)
    n_valid = rng.integers(0, K + 1, size=B)
    eop_mask = (np.arange(K)[None, :] < n_valid[:, None]).astype(np.int32)

    ids, valid, n_topics = C.topic_segment_ids(jnp.asarray(eop_labels), jnp.asarray(eop_mask))
    ids = np.asarray(ids)
    valid = np.asarray(valid)

    got = [int(ids[b, k]) for b in range(B) for k in range(K) if valid[b, k]]
    want = _oracle_segment_ids(eop_labels, eop_mask)
    assert got == want

    # batch_topic_structure (host side) must agree too
    _, seg_ids = batch_topic_structure(eop_labels, eop_mask)
    assert seg_ids.tolist() == want


# ---------------------------------------------------------------------------
# eop_matrix contrastive loss vs ragged oracle
# ---------------------------------------------------------------------------


def _oracle_matrix_loss(feats_flat, seg_ids, temp):
    """Reference cssl.py:21-73 with ragged lists."""
    n = len(seg_ids)
    f = feats_flat / np.linalg.norm(feats_flat, axis=-1, keepdims=True)
    sim = (f @ f.T) / temp
    exp_sim = np.exp(sim)
    num = np.zeros(n)
    den = np.zeros(n)
    for j in range(n):
        for i in range(n):
            if i == j:
                continue
            if seg_ids[i] == seg_ids[j]:
                num[j] += exp_sim[i, j]
            else:
                den[j] += exp_sim[i, j]
    prob = num / (num + den)
    keep = prob != 0
    return float(np.mean(-np.log(prob[keep])))


def test_eop_matrix_loss_matches_oracle():
    rng = np.random.default_rng(4)
    B, K, H = 2, 5, 8
    feats = rng.normal(size=(B, K, H)).astype(np.float32)
    eop_labels = np.array([[0, 1, 1, 0, 1], [1, 0, 1, 1, 1]], dtype=np.int32)
    eop_mask = np.array([[1, 1, 1, 1, 0], [1, 1, 1, 0, 0]], dtype=np.int32)

    got = float(
        C.eop_matrix_cl_loss(
            jnp.asarray(feats), jnp.asarray(eop_labels), jnp.asarray(eop_mask), temp=0.1
        )
    )

    flat_feats = []
    for b in range(B):
        for k in range(K):
            if eop_mask[b, k]:
                flat_feats.append(feats[b, k])
    seg_ids = _oracle_segment_ids(eop_labels, eop_mask)
    want = _oracle_matrix_loss(np.stack(flat_feats), seg_ids, temp=0.1)
    assert abs(got - want) < 1e-4


def test_eop_matrix_loss_gated_when_single_topic():
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(1, 4, 8)).astype(np.float32)
    labels = np.array([[1, 1, 1, 1]], dtype=np.int32)  # all O -> one topic
    mask = np.ones((1, 4), dtype=np.int32)
    got = float(
        C.eop_matrix_cl_loss(jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask), 0.1)
    )
    assert got == 0.0


# ---------------------------------------------------------------------------
# eop pair cosine similarity
# ---------------------------------------------------------------------------


def test_eop_pair_cosine_wraps_within_example():
    rng = np.random.default_rng(6)
    B, K, H = 1, 4, 8
    feats = rng.normal(size=(B, K, H)).astype(np.float32)
    labels = np.array([[0, 1, 0, 1]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 0]], dtype=np.int32)  # 3 valid eops

    sims, out_labels = C.eop_pair_cosine_similarity(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask), temp=1.0
    )
    sims = np.asarray(sims)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert abs(sims[0, 0] - cos(feats[0, 0], feats[0, 1])) < 1e-5
    assert abs(sims[0, 1] - cos(feats[0, 1], feats[0, 2])) < 1e-5
    # last valid wraps to first
    assert abs(sims[0, 2] - cos(feats[0, 2], feats[0, 0])) < 1e-5
    assert sims[0, 3] == IGNORE
    assert np.asarray(out_labels)[0, 3] == IGNORE


def test_eop_pair_cosine_compacts_interior_holes():
    """window_document permits interior IGNORE sent_labels (eop_mask with
    holes); pairing must run over the COMPACTED labeled slots (reference
    utils.py:111-138 compacts before pairing), with sims scattered back to
    the original slot positions (round-3 ADVICE)."""
    rng = np.random.default_rng(7)
    B, K, H = 1, 5, 8
    feats = rng.normal(size=(B, K, H)).astype(np.float32)
    labels = np.array([[0, -100, 1, -100, 0]], dtype=np.int32)
    mask = np.array([[1, 0, 1, 0, 1]], dtype=np.int32)  # interior holes

    sims, out_labels = C.eop_pair_cosine_similarity(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask), temp=1.0
    )
    sims = np.asarray(sims)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # valid slots are 0, 2, 4 -> pairs (0,2), (2,4), (4 wraps to 0)
    assert abs(sims[0, 0] - cos(feats[0, 0], feats[0, 2])) < 1e-5
    assert abs(sims[0, 2] - cos(feats[0, 2], feats[0, 4])) < 1e-5
    assert abs(sims[0, 4] - cos(feats[0, 4], feats[0, 0])) < 1e-5
    assert sims[0, 1] == IGNORE and sims[0, 3] == IGNORE
    assert np.asarray(out_labels)[0, 1] == IGNORE
