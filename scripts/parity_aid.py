"""Cross-framework end-to-end quality-parity harness #2: action-item
detection (Context-Drop).

Companion to scripts/parity_e2e.py (topic segmentation): fine-tunes, on the
SAME synthetic meeting corpus and from the SAME randomly-initialized HF BERT
trunk,

  (a) a torch oracle faithful, op by op, to the reference's TF1 classifier
      (reference: action-item-detection/script/run_classifier.py — cls
      pooling + dropout + linear head :879-985, focal/smoothed CE + alpha *
      symmetric-KL/2 between paired rows :1000-1043; optimizer semantics of
      script/optimization.py:25-65 — linear warmup+decay AdamW, weight decay
      0.01 excluding LayerNorm/bias, global-norm clip 1.0), and

  (b) this framework's own run_aid CLI (spokennlp_tpu.cli.run_aid),

then evaluates both with the same positive-F1 protocol (single un-paired
examples with contexts, argmax at threshold 0.5) and reports the deltas.

Both sides share the host pairing + featurization
(projects/action_item.py:build_paired_examples/collate_examples, themselves
unit-tested against the reference pairing semantics :420-520), so the
comparison isolates the model / loss / training stack. One faithful
divergence is kept on the oracle side: the reference featurizes ONCE and
trains on fixed pairs (tfrecords), so the oracle samples its dynamic context
subsets once; run_aid re-pairs per epoch (documented in cli/run_aid.py).
Parity is metrics-level, not bitwise (different frameworks, different RNGs).

The synthetic corpus makes context genuinely load-bearing: ~30% of positive
sentences carry NO lexical action cue and are recoverable only from a
follow-up cue in the right-context sentence — so Context-Drop's consistency
objective and noisy-label handling actually matter, as in the paper.

Usage:
  python scripts/parity_aid.py --workdir /tmp/parity_aid
Pytest entry point: tests/test_reference_parity_aid.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --------------------------------------------------------------------------
# synthetic meeting corpus
# --------------------------------------------------------------------------

N_FILLER = 20
ACTION_WORDS = [f"act{j}" for j in range(6)]  # "please send the report ..."
CUE_WORD = "cuefollow"  # right-neighbour acknowledgement cue
FILLERS = [f"fill{j}" for j in range(N_FILLER)]


def vocab_words():
    return ACTION_WORDS + [CUE_WORD] + FILLERS


def write_vocab(path: str):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[BOS]"]
    with open(path, "w") as f:
        for w in specials + vocab_words():
            f.write(w + "\n")
    return specials


def gen_meeting(rng: random.Random, n_sentences=60, p_pos=0.15, p_covert=0.3):
    """One meeting. A positive sentence usually contains action words; a
    covert positive has none and is only recoverable from the CUE_WORD its
    right neighbour carries with p=0.9 (spurious cue rate 0.05)."""
    sents = []
    prev_pos = False
    for _ in range(n_sentences):
        words = rng.choices(FILLERS, k=rng.randint(5, 9))
        label = 1 if rng.random() < p_pos else 0
        if label and rng.random() >= p_covert:
            k = rng.randint(1, 2)
            for w in rng.sample(ACTION_WORDS, k):
                words.insert(rng.randrange(len(words) + 1), w)
        cue = rng.random() < (0.9 if prev_pos else 0.05)
        if cue:
            words.insert(0, CUE_WORD)
        sents.append({"text": " ".join(words), "label": label})
        prev_pos = bool(label)
    return {"meeting": f"m{rng.random():.8f}", "sentences": sents}


def write_corpus(data_dir: str, seed: int, n_train=12, n_dev=6):
    os.makedirs(data_dir, exist_ok=True)
    rng = random.Random(seed)
    for split, n in (("train", n_train), ("dev", n_dev)):
        with open(os.path.join(data_dir, f"{split}.jsonl"), "w") as f:
            for _ in range(n):
                f.write(json.dumps(gen_meeting(rng)) + "\n")


def build_assets(workdir: str, seed: int = 0, hidden=64, layers=2, heads=4,
                 intermediate=128):
    """vocab + corpus + one randomly-initialized tiny HF BERT checkpoint
    that BOTH frameworks start from."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    os.makedirs(workdir, exist_ok=True)
    vocab_path = os.path.join(workdir, "vocab.txt")
    write_vocab(vocab_path)
    data_dir = os.path.join(workdir, "data")
    write_corpus(data_dir, seed + 1)

    model_dir = os.path.join(workdir, "trunk")
    tok = BertTokenizer(vocab_file=vocab_path, do_lower_case=True)
    torch.manual_seed(seed)
    cfg = BertConfig(
        vocab_size=tok.vocab_size,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=intermediate,
        max_position_embeddings=512,
    )
    BertModel(cfg).save_pretrained(model_dir)
    tok.save_pretrained(model_dir)
    return {"workdir": workdir, "data_dir": data_dir, "model_dir": model_dir,
            "hidden": hidden}


# --------------------------------------------------------------------------
# hyperparameters (go_train.sh headline recipe scaled to the tiny trunk)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class HP:
    max_seq_length: int = 96
    batch_size: int = 16
    # scaled for the from-scratch tiny trunk (reference go_train.sh: 2e-5 on
    # a pretrained base trunk, 2 epochs)
    learning_rate: float = 1e-3
    epochs: int = 30
    seed: int = 42
    drop_type: str = "context-drop-dynamic"
    noisy_type: str = "update"
    classifier_input: str = "cls"
    loss_type: str = "focal_loss"  # go_train.sh LOSS_TYPE
    kl_alpha: float = 4.0  # go_train.sh KL_ALPHA
    context_width: int = 1  # go_train.sh CONTEXT_WIDTH
    dropout: float = 0.1
    warmup_proportion: float = 0.1  # run_classifier.py flag default


# --------------------------------------------------------------------------
# torch oracle
# --------------------------------------------------------------------------


def _eval_examples(meetings, hp: HP):
    from spokennlp_tpu.projects.action_item import AidConfig, build_paired_examples

    cfg = AidConfig(drop_type="none", noisy_type="remain",
                    max_seq_length=hp.max_seq_length)
    rng = np.random.default_rng(0)
    out = []
    for m in meetings:
        out.extend(build_paired_examples(m["sentences"], cfg, rng,
                                         hp.context_width, False))
    return out


def _positive_prf(preds, labels):
    from spokennlp_tpu.eval.seg_metrics import binary_prf

    return binary_prf(list(preds), list(labels))


def run_torch(assets, hp: HP):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from transformers import BertModel, BertTokenizer

    from spokennlp_tpu.projects.action_item import (
        AidConfig, build_paired_examples, collate_examples,
    )

    torch.manual_seed(hp.seed)
    tok = BertTokenizer.from_pretrained(assets["model_dir"])
    tokenize_fn = lambda s: tok(s, add_special_tokens=False)["input_ids"]
    cls_id = tok.cls_token_id
    sep_id = tok.sep_token_id

    cfg = AidConfig(
        classifier_input=hp.classifier_input, loss_type=hp.loss_type,
        kl_alpha=hp.kl_alpha, drop_type=hp.drop_type,
        noisy_type=hp.noisy_type, max_seq_length=hp.max_seq_length,
        dropout_rate=hp.dropout,
    )

    def load(path):
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]

    train_meetings = load(os.path.join(assets["data_dir"], "train.jsonl"))
    dev_meetings = load(os.path.join(assets["data_dir"], "dev.jsonl"))

    # reference contract: dynamic context subsets are sampled ONCE at
    # featurization time (tfrecords are written once, run_classifier.py
    # file_based_convert_examples_to_features), then reused every epoch
    data_rng = np.random.default_rng(hp.seed)
    train_examples = []
    for m in train_meetings:
        train_examples.extend(
            build_paired_examples(m["sentences"], cfg, data_rng,
                                  hp.context_width, False)
        )
    eval_examples = _eval_examples(dev_meetings, hp)

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = BertModel.from_pretrained(assets["model_dir"])
            self.dropout = nn.Dropout(hp.dropout)
            self.classifier = nn.Linear(assets["hidden"], 2)
            # run_classifier.py:983-989 truncated_normal(0.02) / zeros
            nn.init.trunc_normal_(self.classifier.weight, std=0.02)
            nn.init.zeros_(self.classifier.bias)

        def forward(self, batch):
            out = self.bert(
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                token_type_ids=batch["token_type_ids"],
            )
            return self.classifier(self.dropout(out.pooler_output))

    def loss_fn(logits, labels, training):
        # run_classifier.py:1015-1043
        log_probs = F.log_softmax(logits, -1)
        probs = F.softmax(logits, -1)
        one_hot = F.one_hot(labels, 2).float()
        if hp.loss_type == "focal_loss":
            per_ex = -((one_hot * (1 - probs) ** 2.0) * log_probs).sum(-1)
        else:
            per_ex = -(one_hot * log_probs).sum(-1)
        loss_ce = per_ex.mean()
        if not training or hp.drop_type == "none":
            return loss_ce
        pair = logits.reshape(-1, 2, 2)
        p1, p2 = F.softmax(pair[:, 0], -1), F.softmax(pair[:, 1], -1)
        kl12 = (p1 * (p1.clamp_min(1e-12).log() - p2.clamp_min(1e-12).log())).sum(-1)
        kl21 = (p2 * (p2.clamp_min(1e-12).log() - p1.clamp_min(1e-12).log())).sum(-1)
        loss_kl = (kl12 + kl21).mean() / 2.0
        return loss_ce + hp.kl_alpha * loss_kl

    oracle = Oracle()
    decay, no_decay = [], []
    for n, p in oracle.named_parameters():
        (no_decay if ("LayerNorm" in n or n.endswith("bias")) else decay).append(p)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": 0.01},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=hp.learning_rate, betas=(0.9, 0.999), eps=1e-6,
    )
    steps_per_epoch = (len(train_examples) + hp.batch_size - 1) // hp.batch_size
    total_steps = steps_per_epoch * hp.epochs
    warmup = int(total_steps * hp.warmup_proportion)

    def lr_at(step):
        if warmup and step < warmup:
            return step / warmup
        return max(0.0, (total_steps - step) / max(1, total_steps - warmup))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_at)

    def evaluate():
        oracle.eval()
        preds, labels = [], []
        with torch.no_grad():
            for s in range(0, len(eval_examples), 64):
                chunk = eval_examples[s : s + 64]
                batch = collate_examples(chunk, tokenize_fn, cfg, cls_id, sep_id)
                tb = {k: torch.from_numpy(v).long() for k, v in batch.items()}
                logits = oracle(tb)
                preds.extend(logits.argmax(-1).tolist())
                labels.extend(int(c["label"]) for c in chunk)
        return _positive_prf(preds, labels)

    shuffle_rng = np.random.default_rng(hp.seed + 7)
    best = {"f1": -1.0}
    step = 0
    for _epoch in range(hp.epochs):
        oracle.train()
        pair_starts = list(range(0, len(train_examples), 2))
        shuffle_rng.shuffle(pair_starts)
        order = [i for s in pair_starts for i in (s, s + 1)]
        for s in range(0, len(order), hp.batch_size):
            take = order[s : s + hp.batch_size]
            if len(take) < 2:
                continue
            if len(take) % 2:
                take = take[:-1]
            batch = collate_examples([train_examples[i] for i in take],
                                     tokenize_fn, cfg, cls_id, sep_id)
            tb = {k: torch.from_numpy(v).long() for k, v in batch.items()}
            logits = oracle(tb)
            loss = loss_fn(logits.float(), tb["label"], training=True)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), 1.0)
            opt.step()
            sched.step()
            step += 1
        m = evaluate()
        if m["f1"] > best["f1"]:
            best = dict(m)
    best["train_steps"] = step
    return best


# --------------------------------------------------------------------------
# JAX side: the actual run_aid CLI
# --------------------------------------------------------------------------


def run_jax(assets, hp: HP):
    from spokennlp_tpu.cli import run_aid

    out_dir = os.path.join(assets["workdir"], "jax_out")
    results = run_aid.main([
        "--train_file", os.path.join(assets["data_dir"], "train.jsonl"),
        "--eval_file", os.path.join(assets["data_dir"], "dev.jsonl"),
        "--output_dir", out_dir,
        "--model_name_or_path", assets["model_dir"],
        "--classifier_input", hp.classifier_input,
        "--drop_type", hp.drop_type,
        "--noisy_type", hp.noisy_type,
        "--loss_type", hp.loss_type,
        "--kl_alpha", str(hp.kl_alpha),
        "--context_width", str(hp.context_width),
        "--max_seq_length", str(hp.max_seq_length),
        "--per_device_train_batch_size", str(hp.batch_size),
        "--num_train_epochs", str(hp.epochs),
        "--learning_rate", str(hp.learning_rate),
        "--seed", str(hp.seed),
    ])
    hist = results["history"]
    best_row = max(hist, key=lambda r: r["positive_f1"])
    return {
        "f1": best_row["positive_f1"] / 100.0,
        "precision": best_row["precision"] / 100.0,
        "recall": best_row["recall"] / 100.0,
        "train_steps": len(hist),
    }


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def run_parity(workdir: str, hp: HP, gate: float = 0.2):
    assets = build_assets(workdir, seed=0)
    torch_m = run_torch(assets, hp)
    jax_m = run_jax(assets, hp)
    delta = {"f1": abs(torch_m["f1"] - jax_m["f1"])}
    result = {
        "hp": dataclasses.asdict(hp),
        "torch": torch_m,
        "jax": jax_m,
        "abs_delta": delta,
        "gate": gate,
        "pass": bool(delta["f1"] <= gate),
    }
    with open(os.path.join(workdir, "parity_aid_results.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--allow_tpu", action="store_true",
                    help="don't force the CPU backend (the axon plugin "
                    "ignores JAX_PLATFORMS; jax.config is the only override)")
    args = ap.parse_args()
    if not args.allow_tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    hp = HP()
    if args.epochs is not None:
        hp = dataclasses.replace(hp, epochs=args.epochs)
    result = run_parity(args.workdir, hp, gate=args.gate)
    print(json.dumps(result, indent=2, default=float))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
