"""SLD end-to-end driver: epoch loop -> per-epoch decode -> WER/CER gating
(reference: sld/.../run_clm.py:647-739, 740-905) + speed perturbation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from spokennlp_tpu.models.gpt2 import GPT2Config, GPT2LMModel
from spokennlp_tpu.projects.sld import SLDConfig, SLDTrainer, pack_example
from spokennlp_tpu.projects.sld_pipeline import speed_perturb


def _tiny_setup(n_train=24, n_eval=4, seed=0):
    rng = np.random.default_rng(seed)
    cfg = SLDConfig(
        gpt_vocab_size=40, vocab_size_speech=16, block_size=48,
        max_text_length=12, eos_token_id=39, time_masking=0.3,
    )
    model = GPT2LMModel(GPT2Config(
        vocab_size=cfg.total_vocab, hidden_size=32, num_layers=2, num_heads=2,
        max_position_embeddings=64,
    ))
    # toy task: text = speech tokens mod 8 (+3 offset); learnable mapping
    def make(nspeech):
        sp = rng.integers(0, 16, size=nspeech).tolist()
        tx = [3 + (t % 8) for t in sp[:6]]
        return sp, tx
    train, evals, texts = [], [], []
    detok = lambda ids: " ".join(str(i) for i in ids)
    for _ in range(n_train):
        sp, tx = make(int(rng.integers(6, 12)))
        train.append(pack_example(sp, tx, cfg))
    for _ in range(n_eval):
        sp, tx = make(8)
        ex = pack_example(sp, tx, cfg)
        evals.append(ex)
        texts.append(detok(tx))
    return cfg, model, train, evals, texts, detok


def test_sld_trainer_two_epochs_loss_decreases_and_wer_reported(tmp_path):
    cfg, model, train, evals, texts, detok = _tiny_setup()
    trainer = SLDTrainer(
        model, cfg, optax.adam(3e-3), train, evals, texts, detok,
        batch_size=8, num_epochs=2, decode_max_len=48,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    res = trainer.train()
    hist = res["history"]
    assert len(hist) == 2
    assert hist[1]["train_loss"] < hist[0]["train_loss"]
    for row in hist:
        assert 0.0 <= row["wer"] and 0.0 <= row["cer"]  # reported every epoch
    # best-checkpoint retention wrote something
    import os
    assert os.path.isdir(tmp_path / "ckpt")


def test_sld_trainer_beam_decode_path():
    cfg, model, train, evals, texts, detok = _tiny_setup(n_train=8, n_eval=2)
    trainer = SLDTrainer(
        model, cfg, optax.adam(1e-3), train, evals, texts, detok,
        batch_size=4, num_epochs=1, decode_max_len=48, num_beams=2,
    )
    res = trainer.train()
    assert "wer" in res["final"]


def test_speed_perturb_lengths_and_identity():
    w = np.sin(np.linspace(0, 20, 1600)).astype(np.float32)
    assert speed_perturb(w, 1.0) is not None
    np.testing.assert_array_equal(speed_perturb(w, 1.0), w)
    fast = speed_perturb(w, 1.1)
    slow = speed_perturb(w, 0.9)
    assert abs(len(fast) - round(1600 / 1.1)) <= 1
    assert abs(len(slow) - round(1600 / 0.9)) <= 1
    # content preserved approximately (same signal, resampled)
    mid = speed_perturb(speed_perturb(w, 0.5), 2.0)
    assert np.corrcoef(mid[: len(w)], w[: len(mid)])[0, 1] > 0.99


def test_speed_perturb_batch_axis():
    w = np.stack([np.ones(100, np.float32), np.zeros(100, np.float32)])
    out = speed_perturb(w, 2.0)
    assert out.shape == (2, 50)
    np.testing.assert_allclose(out[0], 1.0)


def test_run_sld_cli_smoke(tmp_path):
    """Full CLI loop: jsonl -> pack -> 2 epochs -> decode -> WER (stage-7
    counterpart of sld/run.sh:231)."""
    import json
    from spokennlp_tpu.cli import run_sld

    rng = np.random.default_rng(0)
    words = ["go", "stop", "left", "right", "up", "down"]
    for name, n in (("train.jsonl", 16), ("eval.jsonl", 3)):
        with open(tmp_path / name, "w") as f:
            for _ in range(n):
                sp = rng.integers(0, 16, size=int(rng.integers(5, 10))).tolist()
                text = " ".join(words[t % len(words)] for t in sp[:4])
                f.write(json.dumps({"speech_tokens": sp, "text": text}) + "\n")
    res = run_sld.main([
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "eval.jsonl"),
        "--output_dir", str(tmp_path / "out"),
        "--vocab_size_speech", "16", "--block_size", "48",
        "--max_text_length", "8", "--per_device_train_batch_size", "4",
        "--num_train_epochs", "2", "--learning_rate", "3e-3",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--num_attention_heads", "2", "--decode_max_len", "48",
    ])
    assert len(res["history"]) == 2
    assert "wer" in res["final"]
    import os
    assert os.path.exists(tmp_path / "out" / "sld_results.json")


def test_run_sld_stages_end_to_end(tmp_path):
    """The full 7-stage pipeline on synthetic wavs with a toy feature fn:
    manifests -> sharded speed-perturbed features -> k-means -> dedup'd
    tokens -> joined jsonl -> BPE -> 1-epoch train (run.sh:51-280)."""
    import wave as wavemod

    from spokennlp_tpu.projects.sld_pipeline import run_sld_stages

    rng = np.random.default_rng(0)
    audio = tmp_path / "audio"
    audio.mkdir()
    words = ["yes", "no", "maybe"]
    lines = []
    for i in range(6):
        t = np.linspace(0, 1, 3200)
        wav = (0.3 * np.sin(2 * np.pi * (100 + 60 * i) * t)).astype(np.float32)
        pcm = (wav * 32767).astype(np.int16)
        with wavemod.open(str(audio / f"utt{i}.wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        lines.append(f"utt{i}\t{words[i % 3]} {words[(i + 1) % 3]}")
    (tmp_path / "trans.tsv").write_text("\n".join(lines))

    def toy_feature_fn(wav):
        # framewise 4-dim features (frame = 400 samples)
        n = len(wav) // 400
        return np.stack([
            wav[: n * 400].reshape(n, 400)[:, :100].mean(1),
            wav[: n * 400].reshape(n, 400).std(1),
            wav[: n * 400].reshape(n, 400).max(1),
            wav[: n * 400].reshape(n, 400).min(1),
        ], axis=1).astype(np.float32)

    # stage 2 fan-out: dump shard 0 and shard 1 in separate calls
    common = dict(
        audio_dir=str(audio), transcript_file=str(tmp_path / "trans.tsv"),
        work_dir=str(tmp_path / "work"), speeds=(0.9, 1.0),
        nshard=2, feature_fn=toy_feature_fn, n_clusters=6,
        valid_percent=0.34, seed=0,
    )
    run_sld_stages(start_stage=1, stop_stage=1, **common)
    run_sld_stages(start_stage=2, stop_stage=2, rank=0, **common)
    run_sld_stages(start_stage=2, stop_stage=2, rank=1, **common)
    state = run_sld_stages(
        start_stage=3, stop_stage=7,
        train_kwargs={
            "vocab_size_speech": "8", "block_size": "48",
            "max_text_length": "8", "per_device_train_batch_size": "2",
            "num_train_epochs": "1", "hidden_size": "16",
            "num_hidden_layers": "1", "num_attention_heads": "2",
            "decode_max_len": "48", "learning_rate": "1e-3",
        },
        **common,
    )
    import os
    wd = tmp_path / "work"
    assert os.path.exists(wd / "kmeans_centers.npy")
    assert os.path.exists(wd / "train.jsonl") and os.path.exists(wd / "valid.jsonl")
    assert os.path.exists(wd / "bpe_merges.txt")
    assert "wer" in state["train_result"]["final"]
    # joined rows have dedup'd integer tokens + text
    import json as j
    row = j.loads(open(wd / "train.jsonl").readline())
    assert row["speech_tokens"] and isinstance(row["speech_tokens"][0], int)
    assert all(a != b for a, b in zip(row["speech_tokens"],
                                      row["speech_tokens"][1:]))
