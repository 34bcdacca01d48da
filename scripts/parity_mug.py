"""Cross-framework end-to-end quality-parity harness #6: MUG Track 1
(PoNet topic segmentation over meeting transcripts).

Companion to parity_e2e / parity_aid / parity_sld / parity_mmvts /
parity_ditto. This one closes the VERDICT round-2 "PoNet fidelity risk" at
the SYSTEM level: the PoNet mixer here is a paper-spec rebuild (the
reference imports the implementation from ModelScope — only the wrapper is
in-repo, alimeeting4mug/src/models/modeling_ponet.py:34-119), so the
harness fine-tunes, on the SAME synthetic AMC-style meeting corpus and from
the SAME randomly-initialized ModelScope-layout PoNet checkpoint,

  (a) a torch oracle of the documented ModelScope PoNet layout (per-head GA
      via transpose_for_scores, SMP with the second-max trick, LMP window
      max — the exact semantics pinned by tests/test_ponet_convert.py) with
      the reference Track-1 training objective (masked CE at labeled EOS
      positions; ponet_topic_segmentation.py:527-691 featurization
      semantics, :852-911 predict flow), and

  (b) this framework's own run_mug CLI (--track topic_segmentation
      --init_checkpoint <shared converted checkpoint>),

then scores BOTH sides with the same official challenge evaluator
(projects/mug/evaluate.py:topic_segment_evaluate — the reference's
challenge_evaluate.py:167 formulas) and compares positive F1. Both sides
share the host featurization (projects/mug/topic_segmentation.py:
window_document_eos EOS windows + per-token segment_ids) and the initial
weights; parity is metrics-level at convergence.

The synthetic corpus carries a lexical boundary cue (a topic's final
sentence ends with a wrap-up word, p=0.9) over 8 topic types; paragraph
ends (the only scored positions, challenge_evaluate.py:194-198 semantics)
occur every 1-2 sentences so ~40% of scored positions are boundaries.
Both models converge near the cue's Bayes F1 (~0.9+); quality differences
anywhere in the mixer/head/training stack show in F1.

Usage:  python scripts/parity_mug.py --workdir /tmp/parity_mug
Pytest: tests/test_reference_parity_mug.py. Committed artifact:
PARITY_MUG.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NEG = -1e9

# --------------------------------------------------------------------------
# hyperparameters (shared by both sides)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class HP:
    hidden: int = 64
    num_heads: int = 4
    num_layers: int = 2
    intermediate: int = 128
    max_seq_length: int = 128
    epochs: int = 16
    learning_rate: float = 3e-4
    batch_size: int = 4
    dropout: float = 0.1
    seed: int = 0


# --------------------------------------------------------------------------
# synthetic AMC-style corpus
# --------------------------------------------------------------------------

N_TOPIC_TYPES = 8
WORDS_PER_TYPE = 8
WRAPUP = "wrapup"  # lexical boundary cue
NOTEKEY = "notekey"  # lexical key-sentence cue (Track 2)


def vocab_words():
    words = [WRAPUP, NOTEKEY]
    for t in range(N_TOPIC_TYPES):
        words += [f"t{t}w{j}" for j in range(WORDS_PER_TYPE)]
    return words


def write_vocab(path: str):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[BOS]"]
    with open(path, "w") as f:
        for w in specials + vocab_words():
            f.write(w + "\n")


def gen_meeting(rng: np.random.Generator, key: str) -> dict:
    """3-5 topics x 2-4 sentences; paragraphs of 1-2 sentences; topic ends
    are always paragraph ends (AMC structure). Cue word ends a topic's final
    sentence with p=0.9; non-final sentences carry it with p=0.02."""
    sentences, topics, para_ends = [], [], []
    for _ in range(int(rng.integers(3, 6))):
        t = int(rng.integers(N_TOPIC_TYPES))
        n_sent = int(rng.integers(2, 5))
        # Track 2: 1-2 key sentences per topic carry the NOTEKEY cue (p=0.9)
        key_local = set(
            rng.choice(n_sent, size=min(n_sent, int(rng.integers(1, 3))),
                       replace=False).tolist()
        )
        key_ids = []
        for si in range(n_sent):
            n_words = int(rng.integers(4, 8))
            words = [
                f"t{t}w{int(rng.integers(WORDS_PER_TYPE))}"
                for _ in range(n_words)
            ]
            if si in key_local:
                if rng.random() < 0.9:
                    words.insert(int(rng.integers(len(words) + 1)), NOTEKEY)
                key_ids.append(len(sentences) + 1)  # global 1-based
            elif rng.random() < 0.02:
                words.append(NOTEKEY)
            is_last = si == n_sent - 1
            if (is_last and rng.random() < 0.9) or (
                not is_last and rng.random() < 0.02
            ):
                words.append(WRAPUP)
            sentences.append(" ".join(words))
            sid = len(sentences)  # 1-based
            if is_last:
                topics.append({
                    "id": sid,
                    "candidate": [{"key_sentence": key_ids}],
                })
                para_ends.append(sid)
            elif rng.random() < 0.5 or (para_ends and sid - para_ends[-1] >= 2):
                para_ends.append(sid)
    return {
        "meeting_key": key,
        "sentences": [{"id": i + 1, "s": s} for i, s in enumerate(sentences)],
        "topic_segment_ids": topics,
        "paragraph_segment_ids": [{"id": i} for i in para_ends],
    }


def build_assets(workdir: str, hp: HP, n_train: int = 48, n_dev: int = 16):
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(hp.seed + 11)
    train = [gen_meeting(rng, f"TR{i:03d}") for i in range(n_train)]
    dev = [gen_meeting(rng, f"DV{i:03d}") for i in range(n_dev)]
    paths = {
        "train": os.path.join(workdir, "train.jsonl"),
        "dev": os.path.join(workdir, "dev.jsonl"),
        "vocab": os.path.join(workdir, "vocab.txt"),
        "model_dir": os.path.join(workdir, "init_ckpt"),
        "workdir": workdir,
    }
    for name, meetings in (("train", train), ("dev", dev)):
        with open(paths[name], "w") as f:
            for m in meetings:
                f.write(json.dumps(m) + "\n")
    write_vocab(paths["vocab"])
    paths["n_vocab"] = 6 + len(vocab_words())
    return paths, train, dev


# --------------------------------------------------------------------------
# shared initial checkpoint (ModelScope PoNet layout)
# --------------------------------------------------------------------------


def make_state_dict(hp: HP, vocab_size: int, rng: np.random.Generator,
                    prefix: str = "ponet.") -> dict:
    """Random init in the documented ModelScope/official PoNet layout
    (hf_convert.ponet_to_encoder_params docstring), BERT-style scales."""
    H, I = hp.hidden, hp.intermediate
    sd = {}

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.normal(0, 0.02, (dout, din)).astype(
            np.float32)
        sd[name + ".bias"] = np.zeros(dout, np.float32)

    def ln(name):
        sd[name + ".weight"] = np.ones(H, np.float32)
        sd[name + ".bias"] = np.zeros(H, np.float32)

    sd[prefix + "embeddings.word_embeddings.weight"] = rng.normal(
        0, 0.02, (vocab_size, H)).astype(np.float32)
    sd[prefix + "embeddings.position_embeddings.weight"] = rng.normal(
        0, 0.02, (hp.max_seq_length, H)).astype(np.float32)
    sd[prefix + "embeddings.token_type_embeddings.weight"] = rng.normal(
        0, 0.02, (2, H)).astype(np.float32)
    ln(prefix + "embeddings.LayerNorm")
    for i in range(hp.num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        for proj in ("dense_q", "dense_k", "dense_o", "dense_segment",
                     "dense_local"):
            lin(lp + "attention.self." + proj, H, H)
        lin(lp + "attention.output.dense", H, H)
        ln(lp + "attention.output.LayerNorm")
        lin(lp + "intermediate.dense", H, I)
        lin(lp + "output.dense", I, H)
        ln(lp + "output.LayerNorm")
    lin("classifier", H, 2)
    return sd


def save_shared_checkpoint(sd: dict, hp: HP, vocab_size: int, model_dir: str):
    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.models import checkpoint_io, hf_convert

    cfg = EncoderConfig(
        vocab_size=vocab_size,
        hidden_size=hp.hidden,
        num_layers=hp.num_layers,
        num_heads=hp.num_heads,
        intermediate_size=hp.intermediate,
        max_position_embeddings=hp.max_seq_length,
        hidden_dropout=hp.dropout,
        attention_dropout=hp.dropout,
        pad_token_id=0,
        add_pooler=False,
        attention_type="ponet",
        ponet_ga_per_head=True,
    )
    trunk = hf_convert.ponet_to_encoder_params(sd, cfg)
    params = {
        "ponet": trunk,
        "classifier": {
            "kernel": sd["classifier.weight"].T,
            "bias": sd["classifier.bias"],
        },
    }
    checkpoint_io.save_checkpoint(model_dir, params, cfg)
    return cfg


# --------------------------------------------------------------------------
# shared featurization (the framework's own host code, used by BOTH sides)
# --------------------------------------------------------------------------


def featurize(meetings, tokenize_fn, hp: HP, eos_id: int):
    from spokennlp_tpu.configs import WindowingConfig
    from spokennlp_tpu.projects.mug import data as mug_data
    from spokennlp_tpu.projects.mug.topic_segmentation import (
        stack_eos_windows,
        window_document_eos,
    )

    wcfg = WindowingConfig(
        max_seq_length=hp.max_seq_length, cls_token_id=2, pad_token_id=0,
        bos_token_id=5)
    windows = []
    parsed_all = []
    for eid, m in enumerate(meetings):
        parsed = mug_data.parse_topic_segmentation(m)
        parsed_all.append(parsed)
        sent_tokens = [tokenize_fn(s) for s in parsed["sentences"]]
        windows.extend(window_document_eos(
            sent_tokens, parsed["labels"], wcfg, eos_id, example_id=eid))
    return stack_eos_windows(windows), windows, parsed_all


def get_tokenizer(vocab_path: str):
    from spokennlp_tpu.utils.tokenization import FullTokenizer

    tok = FullTokenizer.from_vocab_file(vocab_path)
    return tok.encode, tok.vocab


# --------------------------------------------------------------------------
# torch oracle: documented ModelScope PoNet layout, trainable
# --------------------------------------------------------------------------


def make_torch_ponet(hp: HP, sd: dict):
    """Trainable torch module of the documented ModelScope PoNet layout +
    linear head. Returns (param ParameterDict, forward(batch, training))."""
    import torch
    import torch.nn.functional as F

    H, NH = hp.hidden, hp.num_heads
    HD = H // NH

    params = {
        k.replace(".", "/"): torch.nn.Parameter(torch.from_numpy(v.copy()))
        for k, v in sd.items()
    }
    plist = torch.nn.ParameterDict(params)

    def P(name):
        return plist[name.replace(".", "/")]

    def linear(x, name):
        return F.linear(x, P(name + ".weight"), P(name + ".bias"))

    def layernorm(x, name):
        return F.layer_norm(
            x, (H,), P(name + ".weight"), P(name + ".bias"), 1e-12)

    def smp_second_max(x, seg, num_seg):
        """(B, L, D) segment channel-max with the second-max trick, dense
        one-hot formulation (autograd-safe; semantics of
        tests/test_ponet_convert._smp_second_max / models/ponet.py)."""
        onehot = seg[..., None] == torch.arange(num_seg)[None, None, :]
        gate = torch.where(onehot, 0.0, NEG)[..., None]  # (B, L, S, 1)
        m1 = (x[:, :, None, :] + gate).amax(1)  # (B, S, D)
        tok_m1 = torch.einsum("bls,bsd->bld", onehot.float(), m1)
        x2 = torch.where(x >= tok_m1, torch.full_like(x, NEG), x)
        m2 = (x2[:, :, None, :] + gate).amax(1)
        tok_m2 = torch.einsum("bls,bsd->bld", onehot.float(), m2)
        tok_m2 = torch.where(tok_m2 <= NEG / 2, tok_m1, tok_m2)
        return torch.where(x >= tok_m1, tok_m2, tok_m1)

    def forward(batch, training: bool):
        ids = batch["input_ids"]
        mask = batch["attention_mask"]
        segment_ids = batch["segment_ids"]
        B, L = ids.shape
        drop = (lambda x: F.dropout(x, hp.dropout, training))
        emb = (
            P("ponet.embeddings.word_embeddings.weight")[ids]
            + P("ponet.embeddings.position_embeddings.weight")[
                torch.arange(L)][None]
            + P("ponet.embeddings.token_type_embeddings.weight")[
                torch.zeros_like(ids)]
        )
        hidden = drop(layernorm(emb, "ponet.embeddings.LayerNorm"))

        maskf = mask.float()
        for i in range(hp.num_layers):
            lp = f"ponet.encoder.layer.{i}."
            q = linear(hidden, lp + "attention.self.dense_q")
            k = linear(hidden, lp + "attention.self.dense_k")
            v = linear(hidden, lp + "attention.self.dense_o")
            s = linear(hidden, lp + "attention.self.dense_segment")
            l = linear(hidden, lp + "attention.self.dense_local")

            # GA per head (official transpose_for_scores formulation)
            qh = q.view(B, L, NH, HD)
            kh = k.view(B, L, NH, HD)
            vh = v.view(B, L, NH, HD)
            denom = maskf.sum(1).clamp(min=1.0)[:, None, None]
            g = (qh * maskf[:, :, None, None]).sum(1) / denom  # (B, NH, HD)
            att = torch.einsum("bnh,blnh->bln", g, kh) / (HD ** 0.5)
            att = att + (1.0 - maskf)[:, :, None] * NEG
            w = att.softmax(dim=1)
            gp = torch.einsum("bln,blnh->bnh", w, vh)
            ga = (gp[:, None] * qh).reshape(B, L, H)

            # SMP (pad tokens forced to segment 0)
            seg = torch.where(mask.bool(), segment_ids,
                              torch.zeros_like(segment_ids))
            num_seg = int(seg.max().item()) + 1
            smp = smp_second_max(s, seg, num_seg)

            # LMP window 3
            lm = torch.where(mask.bool()[..., None], l,
                             torch.full_like(l, NEG))
            lmp = F.max_pool1d(
                lm.transpose(1, 2), 3, stride=1, padding=1).transpose(1, 2)

            mixed = ga + smp + lmp
            mixed = drop(linear(mixed, lp + "attention.output.dense"))
            hidden = layernorm(
                hidden + mixed, lp + "attention.output.LayerNorm")
            mlp = F.gelu(linear(hidden, lp + "intermediate.dense"))
            mlp = drop(linear(mlp, lp + "output.dense"))
            hidden = layernorm(hidden + mlp, lp + "output.LayerNorm")

        return F.linear(drop(hidden), P("classifier.weight"),
                        P("classifier.bias"))

    return plist, forward


def train_torch(plist, forward, train_batch, hp: HP):
    """Generic masked-CE training loop over stacked EOS windows."""
    import torch
    import torch.nn.functional as F

    opt = torch.optim.AdamW(plist.parameters(), lr=hp.learning_rate,
                            weight_decay=0.01)
    n = train_batch["input_ids"].shape[0]
    order_rng = np.random.default_rng(hp.seed)
    keys = ("input_ids", "attention_mask", "segment_ids", "labels")
    losses = []
    for _ in range(hp.epochs):
        order = order_rng.permutation(n)
        for st in range(0, n, hp.batch_size):
            take = order[st:st + hp.batch_size].tolist()
            while len(take) < hp.batch_size:
                take.append(take[0])
            tb = {k: torch.from_numpy(train_batch[k][take]).long()
                  for k in keys}
            logits = forward(tb, training=True)
            loss = F.cross_entropy(
                logits.reshape(-1, 2), tb["labels"].reshape(-1),
                ignore_index=-100)
            opt.zero_grad()
            loss.backward()
            opt.step()
        losses.append(float(loss.detach()))
    return losses


def predict_torch_logits(forward, batch, hp: HP):
    import torch

    keys = ("input_ids", "attention_mask", "segment_ids", "labels")
    out = []
    m = batch["input_ids"].shape[0]
    with torch.no_grad():
        for st in range(0, m, hp.batch_size):
            tb = {k: torch.from_numpy(batch[k][st:st + hp.batch_size]).long()
                  for k in keys}
            out.append(forward(tb, training=False).numpy())
    return np.concatenate(out, 0)


def run_torch(assets, train_meetings, dev_meetings, hp: HP, sd: dict):
    import torch

    from spokennlp_tpu.projects.mug import data as mug_data
    from spokennlp_tpu.projects.mug import evaluate as mug_eval

    torch.manual_seed(hp.seed)
    tokenize_fn, vocab = get_tokenizer(assets["vocab"])
    eos_id = vocab["[SEP]"]
    train_batch, _, _ = featurize(train_meetings, tokenize_fn, hp, eos_id)
    plist, forward = make_torch_ponet(hp, sd)
    losses = train_torch(plist, forward, train_batch, hp)

    # predict (reference flow :852-911): argmax at labeled EOS positions,
    # boundary = class 0 (B-EOP), aggregate to 1-based sentence ids
    eval_batch, eval_windows, parsed_eval = featurize(
        dev_meetings, tokenize_fn, hp, eos_id)
    logits_all = predict_torch_logits(forward, eval_batch, hp)

    boundaries = [[] for _ in dev_meetings]
    for wi, w in enumerate(eval_windows):
        live = w.labels != -100
        preds = (np.argmax(logits_all[wi][live], -1) == 0).astype(np.int32)
        for sid, pred in zip(w.sent_ids, preds):
            if pred:
                boundaries[w.example_id].append(sid + 1)
    sub = mug_data.topic_segmentation_submission(
        [m["meeting_key"] for m in dev_meetings], boundaries)
    metrics = mug_eval.topic_segment_evaluate(dev_meetings, sub)
    return {
        "pos_f1": metrics["test_pos_f1"],
        "score": metrics["score"],
        "pk": 1.0 - metrics["test_1-pk"],
        "wd": 1.0 - metrics["test_1-wd"],
        "final_loss": losses[-1],
        "epochs": hp.epochs,
    }


def run_torch_es(assets, train_meetings, dev_meetings, hp: HP, sd: dict):
    """Track 2 (topic-level extractive summarization): same PoNet oracle,
    key-sentence labels, multi-reference rouge (reference:
    ponet_extractive_summarization.py + compute_metrics :853-979)."""
    import torch

    from spokennlp_tpu.configs import WindowingConfig
    from spokennlp_tpu.projects.mug.extractive_summarization import (
        evaluate_es_rouge,
        featurize_es_examples,
    )
    from spokennlp_tpu.projects.mug.topic_segmentation import (
        stack_eos_windows,
    )

    torch.manual_seed(hp.seed)
    tokenize_fn, vocab = get_tokenizer(assets["vocab"])
    eos_id = vocab["[SEP]"]
    wcfg = WindowingConfig(
        max_seq_length=hp.max_seq_length, cls_token_id=2, pad_token_id=0,
        bos_token_id=5)

    _, train_windows = featurize_es_examples(
        train_meetings, tokenize_fn, wcfg, eos_id,
        level="topic", annotator_strategy="single")
    plist, forward = make_torch_ponet(hp, sd)
    losses = train_torch(plist, forward, stack_eos_windows(train_windows), hp)

    examples, eval_windows = featurize_es_examples(
        dev_meetings, tokenize_fn, wcfg, eos_id,
        level="topic", annotator_strategy="single")
    logits_all = predict_torch_logits(
        forward, stack_eos_windows(eval_windows), hp)
    # per-example key sentences: softmax prob of class 0 >= 0.5 (the
    # predict_key_sentences host rule, shared semantics)
    scores = [dict() for _ in examples]
    for w, lg in zip(eval_windows, logits_all):
        live = w.labels != -100
        probs = np.exp(lg - lg.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        for sid, p in zip(w.sent_ids, probs[live][:, 0]):
            scores[w.example_id][sid] = float(p)
    preds = [sorted(i + 1 for i, p in sc.items() if p >= 0.5)
             for sc in scores]
    metrics = evaluate_es_rouge(examples, preds)
    return {
        "rouge1_f": metrics["multi-ref-average_rouge-1_f"],
        "rougel_f": metrics["multi-ref-average_rouge-l_f"],
        "final_loss": losses[-1],
        "epochs": hp.epochs,
    }


# --------------------------------------------------------------------------
# JAX side: the actual run_mug CLI
# --------------------------------------------------------------------------


def run_jax(assets, hp: HP, track: str = "topic_segmentation"):
    from spokennlp_tpu.cli import run_mug

    out_dir = os.path.join(assets["workdir"], f"jax_out_{track}")
    res = run_mug.main([
        "--track", track,
        "--train_file", assets["train"],
        "--eval_file", assets["dev"],
        "--output_dir", out_dir,
        "--vocab_file", assets["vocab"],
        "--init_checkpoint", assets["model_dir"],
        "--max_seq_length", str(hp.max_seq_length),
        "--per_device_train_batch_size", str(hp.batch_size),
        "--num_train_epochs", str(hp.epochs),
        "--learning_rate", str(hp.learning_rate),
        "--seed", str(hp.seed),
        "--es_level", "topic",
        "--annotator_strategy", "single",
    ])
    m = res["metrics"]
    if track == "extractive_summarization":
        return {
            "rouge1_f": m["multi-ref-average_rouge-1_f"],
            "rougel_f": m["multi-ref-average_rouge-l_f"],
            "final_loss": res["train_loss"][-1],
            "epochs": hp.epochs,
        }
    return {
        "pos_f1": m["test_pos_f1"],
        "score": m["score"],
        "pk": 1.0 - m["test_1-pk"],
        "wd": 1.0 - m["test_1-wd"],
        "final_loss": res["train_loss"][-1],
        "epochs": hp.epochs,
    }


def run_parity(workdir: str, hp: HP, gate: float = 0.2, n_train=48, n_dev=16,
               track: str = "topic_segmentation"):
    assets, train_meetings, dev_meetings = build_assets(
        workdir, hp, n_train=n_train, n_dev=n_dev)
    sd = make_state_dict(hp, assets["n_vocab"],
                         np.random.default_rng(hp.seed + 101))
    save_shared_checkpoint(sd, hp, assets["n_vocab"], assets["model_dir"])
    if track == "extractive_summarization":
        torch_m = run_torch_es(assets, train_meetings, dev_meetings, hp, sd)
        gate_key = "rouge1_f"
    else:
        torch_m = run_torch(assets, train_meetings, dev_meetings, hp, sd)
        gate_key = "pos_f1"
    jax_m = run_jax(assets, hp, track=track)
    if track == "extractive_summarization":
        delta = {k: abs(torch_m[k] - jax_m[k])
                 for k in ("rouge1_f", "rougel_f")}
    else:
        delta = {k: abs(torch_m[k] - jax_m[k]) for k in ("pos_f1", "score")}
    result = {
        "hp": dataclasses.asdict(hp),
        "track": track,
        "torch": torch_m,
        "jax": jax_m,
        "abs_delta": delta,
        "gate": gate,
        "pass": bool(delta[gate_key] <= gate),
    }
    name = ("parity_mug_results.json" if track == "topic_segmentation"
            else "parity_mug_es_results.json")
    with open(os.path.join(workdir, name), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--track", default="topic_segmentation",
                    choices=["topic_segmentation", "extractive_summarization"])
    ap.add_argument("--allow_tpu", action="store_true")
    args = ap.parse_args()
    if not args.allow_tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    hp = HP()
    if args.epochs is not None:
        hp = dataclasses.replace(hp, epochs=args.epochs)
    result = run_parity(args.workdir, hp, gate=args.gate, track=args.track)
    print(json.dumps(result, indent=2, default=float))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
