"""Cross-framework end-to-end quality-parity harness #4: MMVTS
(multimodal video topic segmentation).

Companion to parity_e2e / parity_aid / parity_sld: fine-tunes, on the SAME
synthetic video corpus (clip transcripts + cached visual features) and from
the SAME randomly-initialized HF BERT text trunk,

  (a) a torch oracle faithful, module by module, to the reference's
      multimodal stack (reference: mmvts/src/models/multi_modal_for_ts.py:
      22-213 forward incl. valid-clip re-packing; projector/
      linear_projector.py:5-31 Linear+LN+Dropout; cross_encoder/
      ma_encoder.py:9-71 merge-attention over the seq-concat of modalities
      with the -1e6 extended mask; predictor/linear_predictor.py:7-63;
      modules/loss_layer.py:7-118 CE + modality InfoNCE; modules/
      contrastive_learning_layer.py:26-100 matrix-mode topic CL with the
      forced last-valid-label=1), trained with the HF-Trainer-equivalent
      loop (AdamW + linear decay), and

  (b) this framework's own run_finetune_multimodal CLI,

then evaluates both with the same metric code (eval/video_metrics.py
evaluate_video_corpus) and compares clip-level F1. Both sides share the
host featurization (projects/mmvts.py:featurize_video → fixed (B, K) clip
grids) and the trunk checkpoint; parity is metrics-level.

The synthetic corpus carries a lexical boundary cue (p=0.9) plus visual
features drawn around per-topic-type directions (boundary = direction
change in the visual stream); both models converge near the cue's Bayes
F1 (~0.95+), so quality differences anywhere in the stack show in F1.

Usage:  python scripts/parity_mmvts.py --workdir /tmp/parity_mmvts
Pytest: tests/test_reference_parity_mmvts.py.
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
# synthetic video corpus (text = weak cue, vis = strong topic signal)
# --------------------------------------------------------------------------

N_TOPIC_TYPES = 8
WORDS_PER_TYPE = 8
WRAPUP = "wrapup"  # weak lexical boundary cue
VIS_DIM = 12


def vocab_words():
    words = [WRAPUP]
    for t in range(N_TOPIC_TYPES):
        words += [f"t{t}w{j}" for j in range(WORDS_PER_TYPE)]
    return words


def write_vocab(path: str):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[BOS]"]
    with open(path, "w") as f:
        for w in specials + vocab_words():
            f.write(w + "\n")


def topic_directions(seed: int = 123):
    rng = np.random.default_rng(seed)
    mu = rng.normal(size=(N_TOPIC_TYPES, VIS_DIM)).astype(np.float32)
    return mu / np.linalg.norm(mu, axis=1, keepdims=True)


def gen_video(rng: random.Random, np_rng: np.random.Generator, mu):
    """3-6 topics of 2-6 clips. Labels: 1 = clip ENDS its topic."""
    text, labels, vis = [], [], []
    n_topics = rng.randint(3, 6)
    prev = -1
    for _ in range(n_topics):
        t = rng.choice([x for x in range(N_TOPIC_TYPES) if x != prev])
        prev = t
        cluster = [f"t{t}w{j}" for j in range(WORDS_PER_TYPE)]
        n_clips = rng.randint(2, 6)
        for ci in range(n_clips):
            words = rng.choices(cluster, k=rng.randint(4, 6))
            is_final = ci == n_clips - 1
            if is_final and rng.random() < 0.9:
                words.append(WRAPUP)
            text.append(" ".join(words))
            labels.append(1 if is_final else 0)
            vis.append(mu[t] + 0.3 * np_rng.normal(size=VIS_DIM))
    return text, labels, np.asarray(vis, np.float32)


def write_corpus(workdir: str, seed: int, n_train=32, n_dev=12):
    data_dir = os.path.join(workdir, "clvts")
    feat_dir = os.path.join(workdir, "vis_feats")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed + 1)
    mu = topic_directions()
    idx = 0
    for split, n in (("train.jsonl", n_train), ("dev.jsonl", n_dev)):
        with open(os.path.join(data_dir, split), "w") as f:
            for _ in range(n):
                text, labels, vis = gen_video(rng, np_rng, mu)
                eid = str(idx)
                np.save(os.path.join(feat_dir, f"{eid}.npy"), vis)
                f.write(json.dumps(
                    {"example_id": eid, "text": text, "labels": labels}) + "\n")
                idx += 1
    return data_dir, feat_dir


def build_assets(workdir: str, seed: int = 0, hidden=64, layers=2, heads=4,
                 intermediate=128, n_train=512, n_dev=48):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    os.makedirs(workdir, exist_ok=True)
    vocab_path = os.path.join(workdir, "vocab.txt")
    write_vocab(vocab_path)
    data_dir, feat_dir = write_corpus(workdir, seed + 1, n_train, n_dev)

    model_dir = os.path.join(workdir, "trunk")
    tok = BertTokenizer(vocab_file=vocab_path, do_lower_case=True)
    torch.manual_seed(seed)
    BertModel(BertConfig(
        vocab_size=tok.vocab_size, hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=intermediate, max_position_embeddings=512,
    )).save_pretrained(model_dir)
    tok.save_pretrained(model_dir)
    return {"workdir": workdir, "data_dir": data_dir, "feat_dir": feat_dir,
            "model_dir": model_dir, "hidden": hidden, "heads": heads,
            "intermediate": intermediate}


@dataclasses.dataclass
class HP:
    max_seq_length: int = 256
    max_clips_per_window: int = 24
    batch_size: int = 8
    # measured (torch probe): at 512 train videos the generalizing lexical
    # + visual rule wins over memorization and F1 converges to ~0.99 by
    # epoch 30; at 32-128 videos every configuration memorized and
    # plateaued near 0.35 (below the all-positive baseline 0.44)
    learning_rate: float = 2e-3
    epochs: int = 60
    seed: int = 42
    mm_hidden: int = 64  # reference projects to the text hidden size
    num_cross_layers: int = 1
    cl_temp: float = 0.1
    weight_label_zero: float = 0.5  # plain CE
    do_topic_cl: bool = True
    dropout: float = 0.1


# --------------------------------------------------------------------------
# shared featurization (both sides)
# --------------------------------------------------------------------------


def featurize_split(assets, hp: HP, split: str):
    """(windows, per-video label rows) via the shared host featurizer."""
    from transformers import BertTokenizer

    from spokennlp_tpu.configs import WindowingConfig
    from spokennlp_tpu.data import corpora
    from spokennlp_tpu.projects.mmvts import featurize_video

    tok = BertTokenizer.from_pretrained(assets["model_dir"])
    tokenize_fn = lambda s: tok(s, add_special_tokens=False)["input_ids"]
    examples = corpora.load_video_jsonl_examples(
        os.path.join(assets["data_dir"], f"{split}.jsonl"))
    wcfg = WindowingConfig(
        max_seq_length=hp.max_seq_length,
        cls_token_id=tok.cls_token_id,
        pad_token_id=tok.pad_token_id,
        bos_token_id=tok.convert_tokens_to_ids("[BOS]"),
    )
    rows = []
    for ex in corpora.tokenize_examples(examples, tokenize_fn):
        eid = ex["example_id"]
        lecture = next(e["lecture"] for e in examples
                       if e["example_id"] == eid)
        vis = np.load(os.path.join(assets["feat_dir"], f"{lecture}.npy"))
        inv = [1 if l == 0 else 0 for l in ex["labels"]]  # loader B-EOP -> EOT
        rows.extend(featurize_video(
            ex["sent_token_ids"], inv, {"vis": vis.astype(np.float32)},
            wcfg, example_id=eid,
            max_clips_per_window=hp.max_clips_per_window,
        ))
    return rows


# --------------------------------------------------------------------------
# torch oracle
# --------------------------------------------------------------------------


def run_torch(assets, hp: HP):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from transformers import BertConfig, BertModel
    from transformers.models.bert.modeling_bert import BertLayer

    from spokennlp_tpu.eval.video_metrics import evaluate_video_corpus

    torch.manual_seed(hp.seed)
    train_rows = featurize_split(assets, hp, "train")
    eval_rows = featurize_split(assets, hp, "dev")
    H, K = assets["hidden"], hp.max_clips_per_window

    cross_cfg = BertConfig(
        hidden_size=hp.mm_hidden, num_hidden_layers=hp.num_cross_layers,
        num_attention_heads=assets["heads"],
        intermediate_size=assets["intermediate"],
        hidden_dropout_prob=hp.dropout, attention_probs_dropout_prob=hp.dropout,
    )
    cross_cfg._attn_implementation = "eager"  # manual BertConfig lacks it

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = BertModel.from_pretrained(assets["model_dir"])
            # linear_projector.py:5-19
            self.proj_text = nn.Linear(H, hp.mm_hidden)
            self.ln_text = nn.LayerNorm(hp.mm_hidden)
            self.proj_vis = nn.Linear(VIS_DIM, hp.mm_hidden)
            self.ln_vis = nn.LayerNorm(hp.mm_hidden)
            self.drop = nn.Dropout(hp.dropout)
            # ma_encoder.py:24-25 (BertSelfAttnLayer == full BertLayer)
            self.cross = nn.ModuleList(
                [BertLayer(cross_cfg) for _ in range(hp.num_cross_layers)])
            # linear_predictor.py:11
            self.classifier = nn.Linear(2 * hp.mm_hidden, 2)

        def forward(self, batch):
            seq = self.bert(
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
            ).last_hidden_state  # (B, L, H)
            # select_class_values_with_batch equivalent on the fixed grid
            text = torch.gather(
                seq, 1,
                batch["clip_positions"].unsqueeze(-1).expand(-1, -1, H),
            )  # (B, K, H)
            vis = batch["vis_feats"]
            pt = self.drop(self.ln_text(self.proj_text(text)))
            pv = self.drop(self.ln_vis(self.proj_vis(vis)))
            # ma: concat on the seq axis + extended mask (ma_encoder.py:40-58)
            z = torch.cat((pt, pv), dim=1)
            cat_mask = torch.cat(
                (batch["clip_mask"], batch["clip_mask"]), dim=1).float()
            ext = (1.0 - cat_mask)[:, None, None, :] * -1000000.0
            for layer in self.cross:
                z = layer(z, attention_mask=ext)[0]
            t_out, v_out = torch.chunk(z, 2, dim=1)
            fused = torch.cat((t_out, v_out), dim=-1)  # cat fuse
            logits = self.classifier(fused)  # (B, K, 2)
            return logits, fused, pt, pv

    def losses(batch, logits, fused, pt, pv):
        mask = batch["clip_mask"].bool()
        labels = batch["clip_labels"]
        # loss_layer.py:14-23 (weight 0.5 => plain CE over valid clips)
        ts = F.cross_entropy(logits[mask], labels[mask])
        # modality InfoNCE over the flattened valid vectors
        # (contrastive_learning_layer.py:26-38; align_before_fuse)
        a = F.normalize(pt[mask], dim=-1)
        b = F.normalize(pv[mask], dim=-1)
        sim = (a @ b.t()) / hp.cl_temp
        eps = 1e-8
        num = torch.exp(torch.diag(sim)) + eps
        den = torch.sum(torch.exp(sim), dim=1) + eps
        m_cl = -torch.log(num / den).mean()
        total = ts + m_cl
        if hp.do_topic_cl:
            # matrix-mode topic CL (contrastive_learning_layer.py:47-100):
            # force each sample's LAST valid label to 1, chunk mask within
            # topics, SimCSE-style ratio excluding the diagonal
            counts = mask.sum(1)
            vl = labels[mask].clone()
            vl[torch.cumsum(counts, 0) - 1] = 1
            n = vl.shape[0]
            vm = torch.zeros((n, n), dtype=torch.bool)
            start = 0
            for idx in (vl == 1).nonzero(as_tuple=False).flatten().tolist():
                vm[start:idx + 1, start:idx + 1] = True
                start = idx + 1
            vm &= ~torch.eye(n, dtype=torch.bool)
            f = F.normalize(fused[mask], dim=-1)
            simf = torch.exp((f @ f.t()) / hp.cl_temp)
            offdiag = 1.0 - torch.eye(n)
            num_t = (simf * vm).sum(1) + eps
            den_t = (simf * offdiag).sum(1) + eps
            total = total + (-torch.log(num_t / den_t).mean())
        return total

    oracle = Oracle()
    opt = torch.optim.AdamW(oracle.parameters(), lr=hp.learning_rate)
    steps_per_epoch = (len(train_rows) + hp.batch_size - 1) // hp.batch_size
    total_steps = steps_per_epoch * hp.epochs
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda s: max(0.0, (total_steps - s) / total_steps))

    keys = ["input_ids", "attention_mask", "clip_positions", "clip_mask",
            "clip_labels", "vis_feats"]

    def to_torch(rows):
        b = {k: torch.tensor(np.stack([r[k] for r in rows])) for k in keys}
        for k in keys:
            if k != "vis_feats":
                b[k] = b[k].long()
        return b

    def evaluate():
        oracle.eval()
        per_video = {}
        with torch.no_grad():
            for s in range(0, len(eval_rows), hp.batch_size):
                chunk = eval_rows[s : s + hp.batch_size]
                logits, *_ = oracle(to_torch(chunk))
                preds = logits.argmax(-1).numpy()
                for i, row in enumerate(chunk):
                    d = per_video.setdefault(
                        row["example_id"], {"labels": {}, "preds": {}})
                    for k in range(K):
                        if row["clip_mask"][k]:
                            cid = int(row["clip_ids"][k])
                            d["labels"][cid] = int(row["clip_labels"][k])
                            d["preds"][cid] = int(preds[i, k])
        examples = []
        for vid, d in per_video.items():
            cids = sorted(d["labels"])
            examples.append({
                "example_id": vid,
                "labels": [d["labels"][c] for c in cids],
                "preds": [d["preds"][c] for c in cids],
                "clip_end_seconds": [float(c + 1) * 10.0 for c in cids],
            })
        return evaluate_video_corpus(examples)

    shuffle = np.random.default_rng(hp.seed + 7)
    for _epoch in range(hp.epochs):
        oracle.train()
        order = shuffle.permutation(len(train_rows))
        for s in range(0, len(order), hp.batch_size):
            take = order[s : s + hp.batch_size].tolist()
            batch = to_torch([train_rows[i] for i in take])
            logits, fused, pt, pv = oracle(batch)
            loss = losses(batch, logits, fused, pt, pv)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
    m = evaluate()
    return {"clip_f1": m["clip_f1"], "pk": m.get("pk"), "wd": m.get("wd"),
            "miou": m.get("miou"), "epochs": hp.epochs}


# --------------------------------------------------------------------------
# JAX side: the actual run_finetune_multimodal CLI
# --------------------------------------------------------------------------


def run_jax(assets, hp: HP):
    from spokennlp_tpu.cli import run_finetune_multimodal

    out_dir = os.path.join(assets["workdir"], "jax_out")
    argv = [
        "--dataset_name", "clvts",
        "--data_dir", assets["data_dir"],
        "--output_dir", out_dir,
        "--do_train", "--do_eval",
        "--model_name_or_path", assets["model_dir"],
        "--vis_feature_dir", assets["feat_dir"],
        "--vis_hidden_size", str(VIS_DIM),
        "--fuse_type", "cat_t_v",
        "--cross_encoder_type", "ma",
        "--num_cross_encoder_layers", str(hp.num_cross_layers),
        "--mm_hidden_size", str(hp.mm_hidden),
        "--weight_label_zero_mm", str(hp.weight_label_zero),
        "--do_modality_cl", "--align_pairs", "tv",
        "--cl_temp", str(hp.cl_temp),
        "--max_seq_length", str(hp.max_seq_length),
        "--max_clips_per_window", str(hp.max_clips_per_window),
        "--per_device_train_batch_size", str(hp.batch_size),
        "--num_train_epochs", str(hp.epochs),
        "--learning_rate", str(hp.learning_rate),
        "--seed", str(hp.seed),
    ]
    if hp.do_topic_cl:
        argv += ["--do_topic_mm_cl", "--topic_cl_type", "matrix"]
    res = run_finetune_multimodal.main(argv)
    ev = res["eval"]
    return {"clip_f1": ev["clip_f1"], "pk": ev.get("pk"), "wd": ev.get("wd"),
            "miou": ev.get("miou"), "epochs": len(res["history"])}


def run_parity(workdir: str, hp: HP, gate: float = 0.2, n_train=512, n_dev=48):
    assets = build_assets(workdir, n_train=n_train, n_dev=n_dev)
    torch_m = run_torch(assets, hp)
    jax_m = run_jax(assets, hp)
    delta = {"clip_f1": abs(torch_m["clip_f1"] - jax_m["clip_f1"])}
    result = {
        "hp": dataclasses.asdict(hp),
        "torch": torch_m,
        "jax": jax_m,
        "abs_delta": delta,
        "gate": gate,
        "pass": bool(delta["clip_f1"] <= gate),
    }
    with open(os.path.join(workdir, "parity_mmvts_results.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--allow_tpu", action="store_true")
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
