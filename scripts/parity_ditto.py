"""Cross-framework quality-parity harness #5: Ditto (learning-free
sentence embeddings via Diagonal Attention Pooling).

Inference-only, so the proof is exact rather than statistical: on the SAME
random BERT trunk and the SAME synthetic STS pairs,

  (a) a torch oracle runs the reference's own pooling math verbatim
      (reference: ditto/evaluation_ditto.py:120-155 — att_first_last =
      sum over tokens of (first_hidden + last_hidden)/2 * mask *
      diagonal(attention[layer][:, head])), and

  (b) this framework's run_ditto CLI computes embeddings through the
      converted trunk (which never materializes the (L, L) attention
      probabilities — projects/ditto.py computes the diagonal analytically),

and both score the pairs by cosine + Spearman against the graded gold.
Because the encoder conversion is logit-parity-exact, the gate here is
TIGHT: |dSpearman| <= 0.02 (observed ~1e-3 class).

Usage:  python scripts/parity_ditto.py --workdir /tmp/parity_ditto
Pytest: tests/test_reference_parity_ditto.py (runs the FULL thing — no
RUN_SLOW gate needed; the whole run is a couple of minutes).
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

WORDS = [f"w{i}" for i in range(60)]


@dataclasses.dataclass
class HP:
    layer: int = 1  # attention layer/head of the diagonal (run_eval_ditto.sh
    head: int = 2   # style recipe; any valid pair works for the parity check)
    max_seq_length: int = 32
    n_pairs: int = 200
    seed: int = 42


def write_vocab(path: str):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[BOS]"]
    with open(path, "w") as f:
        for w in specials + WORDS:
            f.write(w + "\n")


def gen_pairs(rng: random.Random, n_pairs: int):
    """Graded-similarity pairs: s2 copies s1 with k of n words replaced;
    gold = 5 * (1 - k/n)."""
    rows = []
    for _ in range(n_pairs):
        n = rng.randint(6, 12)
        s1 = [rng.choice(WORDS) for _ in range(n)]
        k = rng.randint(0, n)
        idx = rng.sample(range(n), k)
        s2 = list(s1)
        for i in idx:
            s2[i] = rng.choice(WORDS)
        rows.append((" ".join(s1), " ".join(s2), 5.0 * (1 - k / n)))
    return rows


def build_assets(workdir: str, hp: HP, hidden=64, layers=2, heads=4,
                 intermediate=128):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    os.makedirs(workdir, exist_ok=True)
    vocab_path = os.path.join(workdir, "vocab.txt")
    write_vocab(vocab_path)
    tsv = os.path.join(workdir, "sts.tsv")
    rng = random.Random(hp.seed)
    with open(tsv, "w") as f:
        for s1, s2, score in gen_pairs(rng, hp.n_pairs):
            f.write(f"{s1}\t{s2}\t{score}\n")

    model_dir = os.path.join(workdir, "trunk")
    tok = BertTokenizer(vocab_file=vocab_path, do_lower_case=True)
    torch.manual_seed(hp.seed)
    BertModel(BertConfig(
        vocab_size=tok.vocab_size, hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=intermediate, max_position_embeddings=512,
    )).save_pretrained(model_dir)
    tok.save_pretrained(model_dir)
    return {"workdir": workdir, "tsv": tsv, "model_dir": model_dir}


def run_torch(assets, hp: HP):
    import torch
    from scipy.stats import spearmanr
    from transformers import BertModel, BertTokenizer

    tok = BertTokenizer.from_pretrained(assets["model_dir"])
    model = BertModel.from_pretrained(assets["model_dir"]).eval()

    def embed(sents):
        batch = tok(sents, padding=True, truncation=True,
                    max_length=hp.max_seq_length, return_tensors="pt")
        with torch.no_grad():
            out = model(**batch, output_hidden_states=True,
                        output_attentions=True, return_dict=True)
        # evaluation_ditto.py:127,151-155 verbatim
        att = out.attentions
        diag = torch.diagonal(att[hp.layer][:, hp.head, :, :], 0,
                              dim1=1, dim2=2)
        first = out.hidden_states[0]
        last = out.hidden_states[-1]
        mask = batch["attention_mask"].unsqueeze(-1)
        return ((first + last) / 2.0 * mask * diag.unsqueeze(-1)).sum(1).numpy()

    s1, s2, gold = [], [], []
    with open(assets["tsv"]) as f:
        for line in f:
            a, b, g = line.rstrip("\n").split("\t")
            s1.append(a)
            s2.append(b)
            gold.append(float(g))
    e1, e2 = embed(s1), embed(s2)
    cos = np.sum(e1 * e2, -1) / (
        np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1) + 1e-12
    )
    return {"spearman": float(spearmanr(cos, gold).statistic)}


def run_jax(assets, hp: HP):
    from spokennlp_tpu.cli import run_ditto

    out_dir = os.path.join(assets["workdir"], "jax_out")
    res = run_ditto.main([
        "--model_name_or_path", assets["model_dir"],
        "--output_dir", out_dir,
        "--pooler", "att_first_last",
        "--layer", str(hp.layer),
        "--head", str(hp.head),
        "--max_seq_length", str(hp.max_seq_length),
        "--sts_tsv", assets["tsv"],
    ])
    (name, sts) = next(iter(res.items()))
    return {"spearman": float(sts["all_spearman"])}


def run_parity(workdir: str, hp: HP, gate: float = 0.02):
    assets = build_assets(workdir, hp)
    torch_m = run_torch(assets, hp)
    jax_m = run_jax(assets, hp)
    delta = abs(torch_m["spearman"] - jax_m["spearman"])
    result = {
        "hp": dataclasses.asdict(hp),
        "torch": torch_m,
        "jax": jax_m,
        "abs_delta": {"spearman": delta},
        "gate": gate,
        "pass": bool(delta <= gate),
    }
    with open(os.path.join(workdir, "parity_ditto_results.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


# Ditto's published recipe is a per-model (layer, head) table
# (reference: ditto/run_eval_ditto.sh:17-37 — bert(0,9), roberta(0,4),
# electra(0,10), sbert(2,6)). The harness trunk is 2 layers x 4 heads, so
# the table here spans both layers and distinct heads the same way.
RECIPE_TABLE = [(0, 1), (0, 3), (1, 2)]


def run_parity_table(workdir: str, gate: float = 0.02,
                     table=RECIPE_TABLE, n_pairs: int = 200, seed: int = 42):
    """Multi-config parity: one artifact spanning the (layer, head) recipe
    axis. Ditto is a learning-free, inference-only evaluation (reference:
    ditto/evaluation_ditto.py — no training loop exists), so there is no
    training-seed axis to sample; the proof is exact per config instead of
    mean±std over seeds. Top-level torch/jax/abs_delta report the
    worst-delta config so gate checks stay single-valued."""
    base_hp = HP(n_pairs=n_pairs, seed=seed)
    assets = build_assets(workdir, base_hp)
    configs = []
    for layer, head in table:
        hp = HP(layer=layer, head=head, n_pairs=n_pairs, seed=seed)
        torch_m = run_torch(assets, hp)
        jax_m = run_jax(assets, hp)
        delta = abs(torch_m["spearman"] - jax_m["spearman"])
        configs.append({
            "hp": dataclasses.asdict(hp),
            "torch": torch_m,
            "jax": jax_m,
            "abs_delta": {"spearman": delta},
            "pass": bool(delta <= gate),
        })
    worst = max(configs, key=lambda c: c["abs_delta"]["spearman"])
    result = {
        "protocol": (
            "inference-only (learning-free) evaluation — no training, hence "
            "no seed axis; exact proof per (layer, head) config over the "
            "recipe table (reference: ditto/run_eval_ditto.sh:17-37), gate "
            "applied to the worst config"
        ),
        "hp": worst["hp"],
        "torch": worst["torch"],
        "jax": worst["jax"],
        "abs_delta": worst["abs_delta"],
        "configs": configs,
        "gate": gate,
        "pass": bool(all(c["pass"] for c in configs)),
    }
    with open(os.path.join(workdir, "parity_ditto_results.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--gate", type=float, default=0.02)
    ap.add_argument("--allow_tpu", action="store_true")
    args = ap.parse_args()
    if not args.allow_tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    result = run_parity_table(args.workdir, gate=args.gate)
    print(json.dumps(result, indent=2, default=float))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
