"""Training glue: ELECTRA parity, AID/PoNet/MMVTS-pretrain train steps learn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.models import hf_convert
from spokennlp_tpu.train.train_step import create_train_state

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_electra_parity():
    hf_cfg = transformers.ElectraConfig(
        vocab_size=300,
        embedding_size=24,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    tmodel = transformers.ElectraModel(hf_cfg).eval()
    cfg = hf_convert.hf_electra_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(tmodel.state_dict())
    params = hf_convert.electra_to_encoder_params(sd, cfg)

    rng = np.random.default_rng(0)
    B, L = 2, 13
    ids = rng.integers(5, 299, size=(B, L))
    am = np.ones((B, L), dtype=np.int64)
    with torch.no_grad():
        want = tmodel(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    got = np.asarray(
        Encoder(cfg).apply(
            {"params": params},
            jnp.asarray(ids, jnp.int32),
            attention_mask=jnp.asarray(am, jnp.int32),
        ).last_hidden_state
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_aid_train_step_learns():
    from spokennlp_tpu.projects import action_item as AI

    enc = EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    cfg = AI.AidConfig(drop_type="r-drop", max_seq_length=16, dropout_rate=0.0)
    model = AI.AidModel(enc, cfg)
    # learnable: sentences starting with token 'A' are actions
    sents = [{"text": ("A x" if i % 2 else "B x"), "label": i % 2} for i in range(8)]
    examples = AI.build_paired_examples(sents, cfg, np.random.default_rng(0))

    def tok(s):
        return [10 + (ord(c) % 40) for c in s.replace(" ", "")]

    batch = {k: jnp.asarray(v) for k, v in AI.collate_examples(
        examples, tok, cfg, cls_id=2, sep_id=3
    ).items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], batch["sep_position"],
    )["params"]
    tx = optax.adam(5e-3)
    state = create_train_state(params, tx)
    step = AI.make_aid_train_step(model, cfg, tx)
    first = None
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(m["ce"])
    assert float(m["ce"]) < first
    logits = model.apply(
        {"params": state.params}, batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], batch["sep_position"],
    )
    acc = (np.argmax(np.asarray(logits), -1) == np.asarray(batch["label"])).mean()
    assert acc > 0.9


def test_ponet_train_step_learns():
    from spokennlp_tpu.models.ponet import PoNetForTokenClassification
    from spokennlp_tpu.projects.mug.topic_segmentation import make_ponet_train_step

    enc = EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, add_pooler=False,
    )
    model = PoNetForTokenClassification(enc, num_labels=2)
    B, L = 4, 32
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 60, size=(B, L)).astype(np.int32)
    labels = np.full((B, L), -100, np.int32)
    # EOS marker token 9 at every 8th position; label by preceding token parity
    for b in range(B):
        for p in range(7, L, 8):
            ids[b, p] = 9
            labels[b, p] = int(ids[b, p - 1] % 2)
    seg = np.repeat(np.arange(1, 5), 8)[None, :].repeat(B, 0).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "segment_ids": jnp.asarray(seg),
        "labels": jnp.asarray(labels),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        segment_ids=batch["segment_ids"],
    )["params"]
    tx = optax.adam(5e-3)
    state = create_train_state(params, tx)
    step = make_ponet_train_step(model, tx)
    losses = []
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5


def test_mmvts_pretrain_step():
    from spokennlp_tpu.models.multimodal import MultimodalConfig
    from spokennlp_tpu.projects.mmvts import MMVTSModel, make_mmvts_pretrain_step

    enc = EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
    )
    mm = MultimodalConfig(
        hidden_size=32, num_cross_encoder_layers=1, num_cross_encoder_heads=2,
        intermediate_size=64, hidden_dropout=0.0, attention_dropout=0.0,
        cross_encoder_type="none",
    )
    model = MMVTSModel(enc, mm)
    B, L, K = 2, 32, 4
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 60, size=(B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "clip_positions": jnp.asarray([[1, 9, 17, 25]] * B, jnp.int32),
        "clip_mask": jnp.ones((B, K), jnp.int32),
        "clip_labels": jnp.asarray(rng.integers(0, 2, size=(B, K)), jnp.int32),
        "vis_feats": jnp.asarray(rng.normal(size=(B, K, 16)).astype(np.float32)),
        "audio_feats": jnp.asarray(rng.normal(size=(B, K, 12)).astype(np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["clip_positions"], batch["clip_mask"],
        vis_feats=batch["vis_feats"], audio_feats=batch["audio_feats"],
    )["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    step = make_mmvts_pretrain_step(model, tx)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["ts_loss"]) == 0.0  # segmentation loss disabled
    assert np.isfinite(float(m["modality_cl_loss"]))
