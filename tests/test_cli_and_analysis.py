"""CLI smoke tests + corpora converters + analysis utilities."""

import json
import os

import numpy as np
import pytest

from spokennlp_tpu.data import corpora
from spokennlp_tpu.eval import analysis


def _write_corpus(tmp_path, n_docs=8, seed=0):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "topic", "sentence"]
    d = tmp_path / "wiki_section"
    d.mkdir(exist_ok=True)
    for split, n in (("train.jsonl", n_docs), ("dev.jsonl", 3), ("test.jsonl", 3)):
        with open(d / split, "w") as f:
            for _ in range(n):
                ns = int(rng.integers(5, 12))
                sents = [
                    " ".join(rng.choice(words, size=rng.integers(3, 6)))
                    for _ in range(ns)
                ]
                labels = [int(rng.random() < 0.3) for _ in range(ns)]
                labels[-1] = 1
                f.write(json.dumps({"sentences": sents, "labels": labels}) + "\n")
    return str(d)


def test_corpora_loader_label_mapping(tmp_path):
    d = _write_corpus(tmp_path)
    splits = corpora.load_dataset_splits("wiki_section", d)
    assert set(splits) == {"train", "validation", "test"}
    ex = splits["train"][0]
    # raw 1 -> B-EOP(0), raw 0 -> O(1)
    assert all(l in (0, 1, -100) for l in ex["labels"])
    assert ex["labels"][-1] == 0  # last sentence was raw label 1


def test_choi_style_converter(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("========,1,A.\ns1 .\ns2 .\n========,2,B.\ns3 .\n")
    ex = corpora.convert_choi_style_file(str(p))
    assert ex["sentences"] == ["s1 .", "s2 .", "s3 ."]
    assert ex["labels"] == [0, 1, 1]


def test_section_to_sentences_label_scheme():
    sents, labels = corpora.section_to_sentences("Para one. Another sent.\nPara two.")
    # paragraph ends -> 0, final sentence of section -> 1, mid-para -> -100
    assert labels[-1] == 1
    assert 0 in labels or len(labels) == 1


def test_run_finetune_cli_smoke(tmp_path):
    from spokennlp_tpu.cli import run_finetune

    d = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    results = run_finetune.main(
        [
            "--dataset_name", "wiki_section", "--data_dir", d,
            "--output_dir", out, "--do_train", "--do_eval",
            "--hidden_size", "32", "--num_hidden_layers", "1",
            "--num_attention_heads", "2", "--intermediate_size", "64",
            "--max_seq_length", "48", "--num_train_epochs", "1",
            "--per_device_train_batch_size", "1",
            "--gradient_accumulation_steps", "1",
            "--save_hf_format",
        ]
    )
    assert "eval_f1" in results
    assert os.path.exists(os.path.join(out, "all_results.json"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    # ModelScope/save_pretrained-format export alongside the native save
    hf_dir = os.path.join(out, "final_model_hf")
    assert os.path.exists(os.path.join(hf_dir, "pytorch_model.bin"))
    assert os.path.exists(os.path.join(hf_dir, "config.json"))


def test_run_inference_cli_smoke(tmp_path):
    from spokennlp_tpu.cli import run_inference

    d = _write_corpus(tmp_path)
    out = str(tmp_path / "inf")
    res = run_inference.main(
        [
            "--dataset_name", "wiki_section", "--data_dir", d,
            "--output_dir", out, "--do_predict",
            "--hidden_size", "32", "--num_hidden_layers", "1",
            "--num_attention_heads", "2", "--intermediate_size", "64",
            "--max_seq_length", "48", "--threshold", "0.5",
        ]
    )
    assert "f1" in res["metrics"]
    files = os.listdir(out)
    assert any(f.endswith(".txt") for f in files)


# ------------------------------------------------------------------ analysis


def test_ensemble_scores():
    logits = [np.array([[5.0, 0.0], [0.0, 5.0]])]
    cos = [[-3.0, 3.0]]  # dissimilar -> boundary; similar -> no boundary
    labels = [[0, 1]]
    res = analysis.ensemble_scores(logits, cos, labels)
    assert res["ensemble_f1"] == 1.0


def test_sent_level_metric_mapping():
    para_preds = [[1, 0]]
    para_labels = [[1, 0]]
    sent_labels = [[-100, 1, -100, 0]]  # 4 sentences, 2 paragraph points
    res = analysis.sent_level_metric_from_para_level(para_preds, para_labels, sent_labels)
    assert res["para_level"]["f1"] == 1.0
    assert res["sent_level"]["f1"] == 1.0


def test_avg_std_and_pvalue():
    runs = [[77.21, 13.87], [77.17, 13.89], [77.10, 13.91]]
    stats = analysis.compute_avg_std(runs, ["f1", "pk"])
    assert stats["f1"]["mean"] == pytest.approx(77.16, abs=0.01)
    p = analysis.compute_p_value([76.28, 76.24, 75.52], [77.21, 77.17, 77.10])
    assert 0 <= p <= 0.05


def test_data_statistics():
    ex = [{"sentences": ["a", "b", "c"], "labels": [-100, 0, 1]}]
    s = analysis.data_statistics(ex)
    assert s["documents"] == 1 and s["sentences"] == 3
    assert s["topic_boundaries"] == 1
