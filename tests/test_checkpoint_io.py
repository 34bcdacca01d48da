"""Native checkpoint roundtrip + train->inference CLI handoff."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models import checkpoint_io
from spokennlp_tpu.models.topic_seg import TopicSegModel


def test_roundtrip(tmp_path):
    enc = EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32, add_pooler=False,
    )
    model = TopicSegModel(enc, TopicSegConfig())
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32), jnp.int32),
        attention_mask=jnp.ones((1, 32), jnp.int32), deterministic=True,
    )["params"]
    path = str(tmp_path / "ckpt")
    checkpoint_io.save_checkpoint(path, params, enc)
    assert checkpoint_io.is_native_checkpoint(path)
    loaded, cfg = checkpoint_io.load_checkpoint(path)
    assert cfg == enc
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[k]))


def test_train_then_infer_with_saved_model(tmp_path):
    from spokennlp_tpu.cli import run_finetune, run_inference

    rng = np.random.default_rng(0)
    d = tmp_path / "wiki_section"
    d.mkdir()
    for split, n in (("train.jsonl", 6), ("dev.jsonl", 2), ("test.jsonl", 2)):
        with open(d / split, "w") as f:
            for _ in range(n):
                ns = int(rng.integers(4, 8))
                sents = [" ".join(rng.choice(["a", "b", "c"], size=3)) for _ in range(ns)]
                labels = [int(rng.random() < 0.3) for _ in range(ns)]
                labels[-1] = 1
                f.write(json.dumps({"sentences": sents, "labels": labels}) + "\n")
    common_flags = [
        "--dataset_name", "wiki_section", "--data_dir", str(d),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "32",
    ]
    out1 = str(tmp_path / "train_out")
    run_finetune.main(
        common_flags + [
            "--output_dir", out1, "--do_train", "--num_train_epochs", "1",
            "--per_device_train_batch_size", "1", "--gradient_accumulation_steps", "1",
        ]
    )
    model_dir = os.path.join(out1, "final_model")
    assert checkpoint_io.is_native_checkpoint(model_dir)

    out2 = str(tmp_path / "infer_out")
    res = run_inference.main(
        common_flags + [
            "--output_dir", out2, "--do_predict",
            "--model_name_or_path", model_dir, "--threshold", "0.5",
        ]
    )
    assert "f1" in res["metrics"]
