"""SWAB loader + cos-predictor inference + multi-seed CLI."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, WindowingConfig
from spokennlp_tpu.eval.inference import run_topic_seg_inference
from spokennlp_tpu.models.topic_seg import TopicSegModel
from spokennlp_tpu.projects import swab

ENC = EncoderConfig(
    vocab_size=256, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0, add_pooler=False,
)
WCFG = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0, bos_token_id=1)


def test_swab_loader_and_pairs(tmp_path):
    doc = {
        "meeting_key": "M1",
        "language": "zh",
        "dataset_domain": "meeting",
        "sentences": [
            {"id": 1, "s": "呃今天开会", "s_gt": "今天开会", "speaker": 0},
            {"id": 2, "s": "嗯讨论一下", "s_gt": "讨论一下", "speaker": 1},
            {"id": 3, "s": "好的散会", "s_gt": "好的散会", "speaker": 0},
        ],
        "paragraph_segment_ids": [
            {"id": 2, "target": "今天开会，讨论事项。"},
            {"id": 3, "target": "会议结束。"},
        ],
    }
    p = tmp_path / "swab.json"
    p.write_text(json.dumps([doc], ensure_ascii=False))
    docs = swab.load_swab(str(p))
    assert len(docs) == 1
    pairs = swab.paragraph_pairs(docs[0])
    assert len(pairs) == 2
    assert pairs[0]["source"] == "呃今天开会嗯讨论一下"
    assert pairs[0]["target"] == "今天开会，讨论事项。"
    # gt-transcript variant
    pairs_gt = swab.paragraph_pairs(docs[0], use_gt_transcript=True)
    assert pairs_gt[0]["source"] == "今天开会讨论一下"

    res = swab.evaluate_cos2w([pairs[0]["target"]], [pairs[0]["target"]])
    assert res["rouge-l_f"] == pytest.approx(1.0)


def test_cos_predictor_inference():
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(3):
        n = int(rng.integers(4, 9))
        docs.append(
            {
                "sent_token_ids": [
                    rng.integers(10, 250, size=rng.integers(2, 5)).tolist()
                    for _ in range(n)
                ],
                "labels": rng.integers(0, 2, size=n).tolist(),
            }
        )
    model = TopicSegModel(ENC, TopicSegConfig(ts_score_predictor="cos"))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        attention_mask=jnp.ones((1, WCFG.max_seq_length), jnp.int32),
        deterministic=True,
    )["params"]
    out = run_topic_seg_inference(
        model, params, docs, WCFG, batch_size=4, threshold=0.5,
        ts_score_predictor="cos",
    )
    assert "f1" in out["metrics"]
    for doc, res in zip(docs, out["per_doc"]):
        assert res["scores"].ndim == 1
        assert len(res["scores"]) == len(res["labels"])
        assert np.all((res["scores"] >= 0) & (res["scores"] <= 1))


def test_trainer_evaluate_cos_mode(tmp_path):
    """trainer.evaluate in ts_score_predictor=cos mode scores windows from
    sigmoid(adjacent-eop cosine) > 0.5, NOT from the (gradient-free in cos
    mode) linear head: predictions must match a hand-computed cosine walk
    over the same windows."""
    from spokennlp_tpu.configs import TrainConfig
    from spokennlp_tpu.data.windowing import stack_windows, window_document
    from spokennlp_tpu.train.trainer import TopicSegTrainer

    rng = np.random.default_rng(1)
    docs = [
        {
            "sent_token_ids": [
                rng.integers(10, 250, size=rng.integers(2, 5)).tolist()
                for _ in range(int(rng.integers(4, 8)))
            ],
            "labels": rng.integers(0, 2, size=0).tolist(),
        }
        for _ in range(4)
    ]
    for d in docs:
        d["labels"] = rng.integers(0, 2, size=len(d["sent_token_ids"])).tolist()
    task = TopicSegConfig(ts_score_predictor="cos")
    model = TopicSegModel(ENC, task)
    tcfg = TrainConfig(num_train_epochs=1, per_device_batch_size=2,
                       gradient_accumulation_steps=1, checkpoint_dir=None)
    trainer = TopicSegTrainer(model, task, tcfg, WCFG, docs, eval_docs=docs,
                              log_path=str(tmp_path / "m.jsonl"))
    metrics = trainer.evaluate()
    assert {"f1", "pk", "wd"} <= set(metrics)

    # oracle: forward each window, cosine walk at live slots with wrap-around
    windows = []
    for eid, d in enumerate(docs):
        windows.extend(window_document(d["sent_token_ids"], d["labels"], WCFG, eid))
    batch = stack_windows(windows)
    out = model.apply(
        {"params": trainer.state.params},
        jnp.asarray(batch["input_ids"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        deterministic=True,
    )
    seq = np.asarray(out["seq_output"], np.float32)
    preds, refs = [], []
    for i in range(len(windows)):
        live = np.where(batch["labels"][i] != -100)[0]
        if live.size == 0:
            continue
        feats = seq[i][live]
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        nxt = feats[(np.arange(len(live)) + 1) % len(live)]
        cos = (feats * nxt).sum(-1)
        preds.append([1 if v > 0 else 0 for v in cos])
        refs.append(batch["labels"][i][live].tolist())
    from spokennlp_tpu.eval import seg_metrics

    prf = seg_metrics.boundary_prf(preds, refs)
    assert metrics["f1"] == pytest.approx(prf["overall_f1"], abs=1e-6)


def test_multi_seed_cli(tmp_path):
    from spokennlp_tpu.cli import run_finetune

    rng = np.random.default_rng(0)
    d = tmp_path / "wiki_section"
    d.mkdir()
    words = ["a", "b", "c", "d"]
    for split, n in (("train.jsonl", 6), ("dev.jsonl", 2), ("test.jsonl", 2)):
        with open(d / split, "w") as f:
            for _ in range(n):
                ns = int(rng.integers(4, 8))
                sents = [" ".join(rng.choice(words, size=3)) for _ in range(ns)]
                labels = [int(rng.random() < 0.3) for _ in range(ns)]
                labels[-1] = 1
                f.write(json.dumps({"sentences": sents, "labels": labels}) + "\n")
    agg = run_finetune.main(
        [
            "--dataset_name", "wiki_section", "--data_dir", str(d),
            "--output_dir", str(tmp_path / "out"), "--do_eval",
            "--seeds", "1", "2",
            "--hidden_size", "32", "--num_hidden_layers", "1",
            "--num_attention_heads", "2", "--intermediate_size", "64",
            "--max_seq_length", "32", "--num_train_epochs", "1",
            "--per_device_train_batch_size", "1",
            "--gradient_accumulation_steps", "1",
        ]
    )
    assert "eval_f1" in agg
    assert "mean" in agg["eval_f1"] and "std" in agg["eval_f1"]
