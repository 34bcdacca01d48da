import json
import numpy as np

def test_aid_cli(tmp_path):
    from spokennlp_tpu.cli import run_aid
    rng = np.random.default_rng(0)
    words = ["we", "will", "order", "food", "later", "ok"]
    for name, n in (("train.jsonl", 4), ("dev.jsonl", 2)):
        with open(tmp_path / name, "w") as f:
            for i in range(n):
                sents = [{"text": " ".join(rng.choice(words, size=4)),
                          "label": int(rng.random() < 0.3)} for _ in range(6)]
                f.write(json.dumps({"meeting": f"M{i}", "sentences": sents}) + "\n")
    res = run_aid.main([
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "dev.jsonl"),
        "--output_dir", str(tmp_path / "out"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "48", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "4",
        "--classifier_input", "token_max",
        "--drop_type", "context-drop-dynamic",
    ])
    assert "best_positive_f1" in res
    assert len(res["history"]) == 1

def test_ami_rows_to_meetings():
    from spokennlp_tpu.cli.run_aid import ami_rows_to_meetings
    rows = [
        {"meeting_name": "B", "sentence": "s1", "action_label": 1},
        {"meeting_name": "A", "sentence": "s2", "action_label": 0},
        {"meeting_name": "B", "sentence": "s3", "action_label": 0},
    ]
    ms = ami_rows_to_meetings(rows)
    assert [m["meeting"] for m in ms] == ["A", "B"]
    assert ms[1]["sentences"][0] == {"text": "s1", "label": 1}

def test_senteval_loaders(tmp_path):
    from spokennlp_tpu.projects.ditto import load_senteval_classification
    (tmp_path / "rt-polarity.pos").write_text("good movie\ngreat fun\n")
    (tmp_path / "rt-polarity.neg").write_text("bad movie\n")
    d = load_senteval_classification(str(tmp_path), "MR")
    sents, labels = d["all"]
    assert labels == [1, 1, 0] and sents[2] == "bad movie"
    (tmp_path / "train_5500.label").write_text("DESC:def what is x\nNUM:count how many y\n")
    (tmp_path / "TREC_10.label").write_text("DESC:def what is z\n")
    t = load_senteval_classification(str(tmp_path), "TREC")
    assert t["train"][1] == [0, 1] and t["test"][0] == ["what is z"]

def test_ditto_cli(tmp_path):
    """run_ditto over a tiny NATIVE checkpoint + synthetic STS tsv."""
    import jax, jax.numpy as jnp
    from spokennlp_tpu.cli import run_ditto
    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.models.encoder import Encoder
    from spokennlp_tpu.models import checkpoint_io

    enc = EncoderConfig(vocab_size=30522, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64, add_pooler=False)
    encoder = Encoder(enc)
    params = encoder.init(jax.random.PRNGKey(0), jnp.ones((1, 16), jnp.int32))["params"]
    ckpt = tmp_path / "ckpt"
    checkpoint_io.save_checkpoint(str(ckpt), params, enc)

    with open(tmp_path / "sts.tsv", "w") as f:
        f.write("the cat sat\tthe cat sat\t5.0\n")
        f.write("the cat sat\tquantum flux results\t1.0\n")
        f.write("dogs run fast\tdogs run quickly\t4.0\n")
    res = run_ditto.main([
        "--model_name_or_path", str(ckpt),
        "--output_dir", str(tmp_path / "out"),
        "--pooler", "avg_first_last", "--layer", "0", "--head", "1",
        "--max_seq_length", "16", "--batch_size", "2",
        "--sts_tsv", str(tmp_path / "sts.tsv"),
    ])
    assert "sts" in res and "all_spearman" in res["sts"]


def test_maybe_load_pretrained_electra_and_bigbird(tmp_path):
    """CLI checkpoint resolution dispatches ELECTRA (factorized embeddings)
    and BigBird (BERT layout + block-sparse attention_type) converters."""
    import argparse
    import torch
    from transformers import (BigBirdConfig, BigBirdModel, ElectraConfig,
                              ElectraModel)
    import jax, jax.numpy as jnp
    from spokennlp_tpu.cli import common
    from spokennlp_tpu.models.encoder import Encoder

    e_cfg = ElectraConfig(vocab_size=120, embedding_size=16, hidden_size=32,
                          num_hidden_layers=1, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=64)
    e_dir = tmp_path / "electra"
    ElectraModel(e_cfg).save_pretrained(e_dir)
    ns = argparse.Namespace(model_name_or_path=str(e_dir), vocab_file=None)
    cfg, params = common.maybe_load_pretrained(ns, None)
    assert cfg.embedding_size == 16 and cfg.hidden_size == 32
    out = Encoder(cfg).apply({"params": params}, jnp.ones((1, 8), jnp.int32))
    assert out.last_hidden_state.shape == (1, 8, 32)

    b_cfg = BigBirdConfig(vocab_size=130, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=256, block_size=16,
                          num_random_blocks=2, attention_type="block_sparse")
    b_dir = tmp_path / "bigbird"
    BigBirdModel(b_cfg).save_pretrained(b_dir)
    ns = argparse.Namespace(model_name_or_path=str(b_dir), vocab_file=None)
    cfg, params = common.maybe_load_pretrained(ns, None)
    assert cfg.attention_type == "bigbird" and cfg.bigbird_block_size == 16
    out = Encoder(cfg).apply({"params": params},
                             jnp.ones((1, 128), jnp.int32))
    assert out.last_hidden_state.shape == (1, 128, 32)


def _write_mug_corpus(tmp_path, n=3, seed=0):
    rng = np.random.default_rng(seed)
    words = ["预算", "方案", "讨论", "设计", "评审"]
    rows = []
    for i in range(n):
        ns = 8
        sents = [{"id": j + 1, "s": "".join(rng.choice(words, size=3))}
                 for j in range(ns)]
        rows.append({
            "meeting_key": f"M{i}",
            "sentences": sents,
            "paragraph_segment_ids": [{"id": j} for j in (2, 4, 6, 8)],
            "topic_segment_ids": [
                {"id": 4, "candidate": [
                    {"title": "t1", "key_sentence": [1, 2],
                     "key_word": ["预算", "方案"]}]},
                {"id": 8, "candidate": [
                    {"title": "t2", "key_sentence": [5],
                     "key_word": ["设计"]}]},
            ],
            "candidate": [{"key_word": ["预算", "设计"],
                           "key_sentence": [1, 5]}],
            "action_ids": [{"id": 3}],
        })
    for name in ("train.jsonl", "dev.jsonl"):
        with open(tmp_path / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return rows


def test_run_mug_track1(tmp_path):
    from spokennlp_tpu.cli import run_mug

    _write_mug_corpus(tmp_path)
    res = run_mug.main([
        "--track", "topic_segmentation",
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "dev.jsonl"),
        "--output_dir", str(tmp_path / "t1"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "96", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "2",
    ])
    assert "positive_f1" in res["metrics"] or res["metrics"]
    import os
    assert os.path.exists(tmp_path / "t1" / "submission.jsonl")


def test_run_mug_track2(tmp_path):
    from spokennlp_tpu.cli import run_mug

    _write_mug_corpus(tmp_path)
    res = run_mug.main([
        "--track", "extractive_summarization",
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "dev.jsonl"),
        "--output_dir", str(tmp_path / "t2"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "96", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "2", "--es_top_ratio", "0.3",
    ])
    assert any("rouge" in k for k in res["metrics"])


def test_run_mug_track4(tmp_path):
    from spokennlp_tpu.cli import run_mug

    _write_mug_corpus(tmp_path)
    res = run_mug.main([
        "--track", "keyphrase",
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "dev.jsonl"),
        "--output_dir", str(tmp_path / "t4"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "32", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "2", "--kpe_top_k", "10",
    ])
    assert res["metrics"]


def test_relatedness_file_formats(tmp_path):
    from spokennlp_tpu.projects.ditto import load_relatedness_files

    (tmp_path / "SICK_train.txt").write_text(
        "pair_ID\tsentence_A\tsentence_B\trelatedness_score\tjudgment\n"
        "1\ta cat sits\ta cat is sitting\t4.5\tENTAILMENT\n")
    (tmp_path / "SICK_test_annotated.txt").write_text(
        "pair_ID\tsentence_A\tsentence_B\trelatedness_score\tjudgment\n"
        "2\tdogs run\tcars drive\t1.2\tNEUTRAL\n")
    d = load_relatedness_files(str(tmp_path), "sick")
    assert d["train"] == (["a cat sits"], ["a cat is sitting"], [4.5])
    assert d["test"][2] == [1.2]

    (tmp_path / "sts-train.csv").write_text(
        "main-news\tMSRpar\t2012\t1\t3.8\tsent one\tsent two\n")
    (tmp_path / "sts-test.csv").write_text(
        "main-news\tMSRpar\t2012\t2\t0.4\tx y\tz w\n")
    d = load_relatedness_files(str(tmp_path), "stsb")
    assert d["train"] == (["sent one"], ["sent two"], [3.8])


def test_extract_features_cli(tmp_path):
    """JSONL schema parity with the reference feature dumper
    (action-item-detection/script/extract_features.py:391-412)."""
    from spokennlp_tpu.cli import run_extract_features

    inp = tmp_path / "input.txt"
    inp.write_text("let us order food\nfirst sentence ||| second sentence\n")
    out = tmp_path / "features.jsonl"
    n = run_extract_features.main([
        "--input_file", str(inp), "--output_file", str(out),
        "--layers=-1,-2", "--max_seq_length", "16", "--batch_size", "2",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--num_attention_heads", "2", "--intermediate_size", "64",
    ])
    assert n == 2
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["linex_index"] for r in rows] == [0, 1]
    f0 = rows[0]["features"]
    assert f0[0]["token"] == "[CLS]"
    assert [l["index"] for l in f0[0]["layers"]] == [-1, -2]
    assert len(f0[0]["layers"][0]["values"]) == 32
    # pair example carries both segments and the trailing [SEP]
    toks1 = [t["token"] for t in rows[1]["features"]]
    assert toks1.count("[SEP]") == 2
