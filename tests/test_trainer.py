"""Trainer smoke: loss goes down on a learnable toy task; checkpoint/resume."""

import numpy as np
import pytest

import jax.numpy as jnp

from spokennlp_tpu.configs import (
    EncoderConfig,
    TopicSegConfig,
    TrainConfig,
    WindowingConfig,
)
from spokennlp_tpu.models.topic_seg import TopicSegModel
from spokennlp_tpu.train.trainer import TopicSegTrainer

ENC = EncoderConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=1,
    num_heads=2,
    intermediate_size=64,
    max_position_embeddings=32,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    add_pooler=False,
)
WCFG = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0, bos_token_id=1)


def _learnable_docs(n_docs=12):
    """Boundary sentences start with token 50; others with token 60 — a
    pattern a 1-layer model can learn quickly."""
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(5, 9))
        labels = rng.integers(0, 2, size=n).tolist()
        sents = []
        for l in labels:
            lead = 50 if l == 0 else 60
            sents.append([lead] + rng.integers(70, 120, size=2).tolist())
        docs.append({"sent_token_ids": sents, "labels": labels})
    return docs


def test_loss_decreases_and_f1_improves(tmp_path):
    docs = _learnable_docs(24)
    task = TopicSegConfig(cl_loss_weight=0.0, do_tssp=False, do_da_ts=False)
    tcfg = TrainConfig(
        learning_rate=5e-3,
        num_train_epochs=40,
        per_device_batch_size=1,
        gradient_accumulation_steps=1,
        eval_cnt=1,
        log_every=5,
        seed=0,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    model = TopicSegModel(ENC, task)
    trainer = TopicSegTrainer(
        model, task, tcfg, WCFG, docs, eval_docs=docs,
        log_path=str(tmp_path / "metrics.jsonl"),
    )
    # batch_size is per_device * 8 virtual devices = 8
    before = trainer.evaluate()
    result = trainer.train()
    after = trainer.evaluate()
    assert after["f1"] > before["f1"]
    assert after["f1"] > 0.85, after

    # checkpoints written; resume restores the state
    assert trainer._ckpt_mgr.latest_step() is not None
    trainer2 = TopicSegTrainer(
        model, task, tcfg, WCFG, docs, eval_docs=docs,
    )
    trainer2._ckpt_mgr = trainer._ckpt_mgr
    assert trainer2.restore_best()
    resumed = trainer2.evaluate()
    assert resumed["f1"] == pytest.approx(after["f1"], abs=1e-6) or resumed["f1"] > 0.9


def test_train_with_full_objective():
    """Composite objective (CSSL list + TSSP + DA) runs a few steps without NaN."""
    docs = _learnable_docs(6)
    task = TopicSegConfig(
        cl_loss_weight=0.5,
        cl_anchor_level="eop_list",
        do_tssp=True,
        do_da_ts=True,
        tssp_loss_weight=1.0,
    )
    tcfg = TrainConfig(
        learning_rate=1e-3,
        num_train_epochs=2,
        per_device_batch_size=1,
        gradient_accumulation_steps=1,
        eval_cnt=1,
        log_every=1,
        seed=0,
    )
    model = TopicSegModel(ENC, task)
    trainer = TopicSegTrainer(model, task, tcfg, WCFG, docs, eval_docs=docs)
    result = trainer.train()
    assert np.isfinite(result["final_f1"])
