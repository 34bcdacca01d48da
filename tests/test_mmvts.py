"""MMVTS tests: fusion model variants, losses vs torch oracles, video metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TrainConfig, WindowingConfig
from spokennlp_tpu.eval import video_metrics as VM
from spokennlp_tpu.models.multimodal import MultiModalForTS, MultimodalConfig
from spokennlp_tpu.objectives import mmvts_losses as ML
from spokennlp_tpu.projects.mmvts import MMVTSModel, featurize_video, make_mmvts_train_step

torch = pytest.importorskip("torch")


def _feats(rng, B, K, H):
    return jnp.asarray(rng.normal(size=(B, K, H)).astype(np.float32))


@pytest.mark.parametrize("ce_type", ["ma", "ca", "ma_moe", "ca_moe", "none"])
def test_fusion_variants_forward(ce_type):
    cfg = MultimodalConfig(
        hidden_size=32,
        num_cross_encoder_layers=1,
        num_cross_encoder_heads=2,
        intermediate_size=64,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        cross_encoder_type=ce_type,
        moe_num_experts=3,
        moe_top_k=2,
    )
    rng = np.random.default_rng(0)
    B, K = 2, 6
    model = MultiModalForTS(cfg)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    t, v, a = _feats(rng, B, K, 48), _feats(rng, B, K, 40), _feats(rng, B, K, 24)
    params = model.init(jax.random.PRNGKey(0), mask, t, v, a)["params"]
    out = model.apply({"params": params}, mask, t, v, a)
    assert out["logits"].shape == (B, K, 2)
    assert out["fused"].shape == (B, K, cfg.fused_width)
    if "moe" in ce_type:
        assert out["moe_loss"] is not None and np.isfinite(float(out["moe_loss"]))
    else:
        assert out["moe_loss"] is None


@pytest.mark.parametrize("predictor", ["linear", "transformer", "hybrid"])
def test_predictor_variants(predictor):
    cfg = MultimodalConfig(
        hidden_size=32,
        num_cross_encoder_layers=1,
        num_cross_encoder_heads=2,
        intermediate_size=64,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        predictor_type=predictor,
    )
    rng = np.random.default_rng(1)
    B, K = 2, 4
    model = MultiModalForTS(cfg)
    mask = jnp.ones((B, K), jnp.int32)
    t, v, a = _feats(rng, B, K, 48), _feats(rng, B, K, 40), _feats(rng, B, K, 24)
    params = model.init(jax.random.PRNGKey(0), mask, t, v, a)["params"]
    out = model.apply({"params": params}, mask, t, v, a)
    assert out["logits"].shape == (B, K, 2)


@pytest.mark.parametrize("weight_type", ["p", "l"])
@pytest.mark.parametrize("pooling", ["mean", "max"])
def test_hybrid_predictor_matches_reference_math(weight_type, pooling):
    """Numpy oracle of the reference hybrid combine (hybrid_predictor.py:29-58):
    mm/text/vis logit streams * softmax stream weights -> mean/max pool."""
    from spokennlp_tpu.models.multimodal import HybridPredictor

    cfg = MultimodalConfig(
        hidden_size=16,
        fuse_type="cat_t_v",
        predictor_type="hybrid",
        predictor_hybrid_weight_type=weight_type,
        predictor_hybrid_pooling=pooling,
    )
    rng = np.random.default_rng(3)
    B, K, H = 2, 5, 16
    feats = {
        "text": jnp.asarray(rng.normal(size=(B, K, H)).astype(np.float32)),
        "vis": jnp.asarray(rng.normal(size=(B, K, H)).astype(np.float32)),
    }
    fused = jnp.concatenate([feats["text"], feats["vis"]], axis=-1)
    mod = HybridPredictor(cfg)
    params = mod.init(jax.random.PRNGKey(0), feats, fused)["params"]
    got = np.asarray(mod.apply({"params": params}, feats, fused))

    def dense(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    streams = np.stack(
        [
            dense(params["mm_classifier"], np.asarray(fused)),
            dense(params["text_classifier"], np.asarray(feats["text"])),
            dense(params["vis_classifier"], np.asarray(feats["vis"])),
        ],
        axis=-1,
    )  # (B, K, C, 3)
    if weight_type == "p":
        w = np.asarray(params["modal_weights"], np.float64)
        np.testing.assert_allclose(w, [0.5, 0.3, 0.2])  # reference init
        e = np.exp(w - w.max())
        weights = np.broadcast_to(e / e.sum(), (B, K, 3))
    else:
        gates = np.concatenate(
            [
                np.tanh(dense(params["text_gate"], np.asarray(feats["text"]))),
                np.tanh(dense(params["vis_gate"], np.asarray(feats["vis"]))),
            ],
            axis=-1,
        )
        z = dense(params["gate_classifier"], gates)
        e = np.exp(z - z.max(axis=-1, keepdims=True))
        weights = e / e.sum(axis=-1, keepdims=True)
    weighted = streams * weights[..., None, :]
    want = weighted.max(axis=-1) if pooling == "max" else weighted.mean(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_out_modal_prob_splits_sum_to_logits():
    """Per-modality additive logit splits (linear_predictor.py:18-35): kernel
    chunked per modality, bias split evenly — the splits must sum back to the
    full cat-classifier logits."""
    cfg = MultimodalConfig(
        hidden_size=16,
        cross_encoder_type="none",
        fuse_type="cat",
        out_modal_prob=True,
    )
    rng = np.random.default_rng(4)
    B, K = 2, 4
    model = MultiModalForTS(cfg)
    mask = jnp.ones((B, K), jnp.int32)
    t, v, a = _feats(rng, B, K, 24), _feats(rng, B, K, 20), _feats(rng, B, K, 12)
    params = model.init(jax.random.PRNGKey(0), mask, t, v, a)["params"]
    out = model.apply({"params": params}, mask, t, v, a)
    modal = out["modal_logits"]
    assert len(modal) == 3
    np.testing.assert_allclose(
        np.asarray(sum(modal)), np.asarray(out["logits"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("ce_type", ["ma_moe", "ca_moe"])
def test_moe_share_in_layers_shares_expert_bank(ce_type):
    """cross_moe_share_in_layers: one expert bank across layers (reference:
    ca_moe_encoder.py:102-105)."""
    cfg = MultimodalConfig(
        hidden_size=32,
        num_cross_encoder_layers=2,
        num_cross_encoder_heads=2,
        intermediate_size=64,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        cross_encoder_type=ce_type,
        moe_num_experts=2,
        moe_top_k=1,
        moe_share_in_layers=True,
    )
    rng = np.random.default_rng(5)
    B, K = 2, 4
    model = MultiModalForTS(cfg)
    mask = jnp.ones((B, K), jnp.int32)
    t, v, a = _feats(rng, B, K, 24), _feats(rng, B, K, 20), _feats(rng, B, K, 12)
    params = model.init(jax.random.PRNGKey(0), mask, t, v, a)["params"]
    ce = params["cross_encoder"]
    assert "moe_shared" in ce and not any(k.startswith("moe_0") for k in ce)
    out = model.apply({"params": params}, mask, t, v, a)
    assert np.isfinite(float(out["moe_loss"]))


def test_modality_cl_matches_torch_oracle():
    """Oracle: reference ModalityContrastiveLearning over packed valid clips."""
    rng = np.random.default_rng(2)
    B, K, H = 2, 5, 16
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], np.int32)
    fa = rng.normal(size=(B, K, H)).astype(np.float32)
    fb = rng.normal(size=(B, K, H)).astype(np.float32)
    got = float(
        ML.modality_cl_loss(jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(mask), 0.1)
    )

    eps = 1e-8
    a = torch.tensor(fa[mask.astype(bool)])
    b = torch.tensor(fb[mask.astype(bool)])
    x = a / (a.norm(dim=1, keepdim=True) + eps)
    y = b / (b.norm(dim=1, keepdim=True) + eps)
    sim = torch.matmul(x, y.t()) / 0.1
    num = torch.exp(torch.diag(sim)) + eps
    den = torch.sum(torch.exp(sim), dim=1) + eps
    want = float((-torch.log(num / den)).mean())
    assert got == pytest.approx(want, abs=1e-5)


def test_topic_cl_matrix_matches_torch_oracle():
    """Oracle: reference TopicContrastiveLearning.matrix_type_loss."""
    rng = np.random.default_rng(3)
    B, K, H = 2, 5, 8
    mask = np.asarray([[1, 1, 1, 1, 0], [1, 1, 1, 0, 0]], np.int32)
    labels = np.asarray([[0, 1, 0, 0, 0], [1, 0, 0, 0, 0]], np.int32)
    fused = rng.normal(size=(B, K, H)).astype(np.float32)

    got = float(
        ML.topic_cl_matrix_loss(
            jnp.asarray(fused), jnp.asarray(labels), jnp.asarray(mask), 0.1
        )
    )

    # oracle on packed features
    eps = 1e-8
    valid = mask.astype(bool)
    f = torch.tensor(fused[valid])
    lab = labels[valid].copy()
    # per-sample last valid label -> 1
    counts = valid.sum(1)
    idx = np.cumsum(counts) - 1
    lab[idx] = 1
    n = len(lab)
    vm = torch.zeros((n, n), dtype=torch.int64)
    start = 0
    for i, l in enumerate(lab):
        if l == 1:
            vm[start : i + 1, start : i + 1] = 1
            start = i + 1
    vm = vm & ~torch.eye(n, dtype=torch.bool)
    x = f / (f.norm(dim=1, keepdim=True) + eps)
    sim = torch.exp(torch.matmul(x, x.t()) / 0.1)
    num = (sim * vm).sum(1) + eps
    den = (sim * (1 - torch.eye(n))).sum(1) + eps
    want = float((-torch.log(num / den)).mean())
    assert got == pytest.approx(want, rel=1e-4)


def test_mmvts_end_to_end_train_step():
    enc = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
    )
    mm = MultimodalConfig(
        hidden_size=32, num_cross_encoder_layers=1, num_cross_encoder_heads=2,
        intermediate_size=64, hidden_dropout=0.0, attention_dropout=0.0,
        cross_encoder_type="ca_moe", text_hidden_size=32,
    )
    wcfg = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0, bos_token_id=1)

    rng = np.random.default_rng(4)
    n_clips = 10
    clip_tokens = [rng.integers(5, 120, size=3).tolist() for _ in range(n_clips)]
    clip_labels = rng.integers(0, 2, size=n_clips).tolist()
    feats = {
        "vis": rng.normal(size=(n_clips, 16)).astype(np.float32),
        "audio": rng.normal(size=(n_clips, 12)).astype(np.float32),
    }
    windows = featurize_video(clip_tokens, clip_labels, feats, wcfg, max_clips_per_window=8)
    assert windows
    batch = {
        k: jnp.asarray(np.stack([w[k] for w in windows]))
        for k in ("input_ids", "attention_mask", "clip_positions", "clip_mask",
                  "clip_labels", "vis_feats", "audio_feats")
    }

    model = MMVTSModel(enc, mm)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"], batch["attention_mask"],
        batch["clip_positions"], batch["clip_mask"],
        vis_feats=batch["vis_feats"], audio_feats=batch["audio_feats"],
    )["params"]

    import optax
    from spokennlp_tpu.train.train_step import create_train_state

    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    step = make_mmvts_train_step(
        model, tx,
        loss_kwargs=dict(
            do_modality_cl=True,
            align_pairs={"tv": 1.0, "av": 1.0},
            do_topic_mm_cl=True,
        ),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("ts_loss", "modality_cl_loss", "topic_mm_cl_loss", "moe_loss", "total_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), (k, metrics)


# ------------------------------------------------------------- video metrics


def test_bs_at_k_and_miou():
    labels = [30, 60, 100]
    # preds hit 30 (off by 10) and 100 exactly; 60 missed
    preds = [40, 100]
    bs, hits, n = VM.bs_at_k(labels, preds, threshold=30)
    assert bs == pytest.approx(2 / 3)
    assert (hits, n) == (1, 2)
    assert VM.miou_by_overlap(labels, labels) == pytest.approx(1.0)
    assert VM.miou_by_overlap(labels, [100]) < 1.0


def test_evaluate_video_corpus_perfect():
    ex = {
        "labels": [0, 1, 0, 0, 1],
        "preds": [0, 1, 0, 0, 1],
        "clip_end_seconds": [10, 20, 30, 40, 50],
    }
    res = VM.evaluate_video_corpus([ex])
    assert res["bs@30"] == pytest.approx(1.0)
    assert res["miou"] == pytest.approx(1.0)
    assert res["clip_f1"] == pytest.approx(1.0)
    assert res["1-pk"] == pytest.approx(1.0)


def test_summarize_runs():
    s = VM.summarize_runs([{"f1": 0.5}, {"f1": 0.7}])
    assert s["f1"].startswith("0.6000±")
