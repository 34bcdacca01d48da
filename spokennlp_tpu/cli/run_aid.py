"""Action-item detection training CLI (Context-Drop / R-Drop).

Counterpart of the reference's TF1 estimator driver (reference:
action-item-detection/script/run_classifier.py:29-1766): sentence+context
classification with example doubling (R-Drop :420-449, Context-Drop fix
:451-480 / dynamic :483-520), cls/sep/token_avg/token_max classifier inputs
(:879-970), focal loss / label smoothing (:1015-1030), symmetric KL between
paired logits (:1000-1043), positive-F1 eval gating.

Input: meetings jsonl, rows {"sentences": [{"text": ..., "label": 0/1}]}
(data/ami.py's process_ami_corpus output converts via ami_rows_to_meetings).
"""

from __future__ import annotations

import argparse
import json
import os


def ami_rows_to_meetings(rows):
    """data/ami.py row dicts -> the meetings jsonl structure."""
    meetings = {}
    for r in rows:
        meetings.setdefault(r["meeting_name"], []).append(
            {"text": r["sentence"], "label": int(r["action_label"])}
        )
    return [{"meeting": k, "sentences": v} for k, v in sorted(meetings.items())]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_file", required=True)
    p.add_argument("--eval_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--classifier_input", default="cls",
                   choices=["cls", "sep", "token_avg", "token_max"])
    p.add_argument("--drop_type", default="context-drop-dynamic",
                   choices=["none", "r-drop", "context-drop-fix",
                            "context-drop-dynamic"])
    p.add_argument("--noisy_type", default="update",
                   choices=["skip", "update", "remain"])
    p.add_argument("--loss_type", default="ce", choices=["ce", "focal_loss"])
    p.add_argument("--do_label_smoothing", action="store_true")
    p.add_argument("--kl_alpha", type=float, default=1.0)
    p.add_argument("--context_width", type=int, default=2)
    p.add_argument("--use_global_context", action="store_true")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--per_device_train_batch_size", type=int, default=16)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save_hf_format", action="store_true",
                   help="also export best_model_hf in save_pretrained format")
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from spokennlp_tpu.cli import common
    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.eval.seg_metrics import binary_prf
    from spokennlp_tpu.projects.action_item import (
        AidConfig,
        AidModel,
        build_paired_examples,
        collate_examples,
        make_aid_train_step,
    )
    from spokennlp_tpu.train.train_step import create_train_state

    ns = argparse.Namespace(model_name_or_path=args.model_name_or_path,
                            vocab_file=None)
    tokenize_fn, special = common.resolve_tokenizer(ns)

    cfg = AidConfig(
        classifier_input=args.classifier_input,
        loss_type=args.loss_type,
        do_label_smoothing=args.do_label_smoothing,
        kl_alpha=args.kl_alpha,
        drop_type=args.drop_type,
        noisy_type=args.noisy_type,
        max_seq_length=args.max_seq_length,
    )

    def load_meetings(path):
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]

    train_meetings = load_meetings(args.train_file)
    eval_meetings = load_meetings(args.eval_file)

    import dataclasses as dc

    enc_cfg = EncoderConfig(
        vocab_size=special["vocab_size"],
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_position_embeddings=max(args.max_seq_length, 512),
        pad_token_id=special["pad"],
        add_pooler=args.classifier_input == "cls",
    )
    pretrained = common.maybe_load_pretrained(ns, enc_cfg)
    trunk = None
    if pretrained is not None:
        # adopt the checkpoint's architecture (run_finetune pattern) and
        # resize embeddings for tokenizer growth ([BOS] etc.)
        loaded_cfg, trunk = pretrained
        trunk, loaded_cfg = common.resize_word_embeddings(
            trunk, loaded_cfg, special["vocab_size"], seed=args.seed
        )
        enc_cfg = dc.replace(
            loaded_cfg, add_pooler=args.classifier_input == "cls"
        )
    model = AidModel(enc_cfg, cfg)
    L = args.max_seq_length
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.ones((2, L), jnp.int32),
        jnp.ones((2, L), jnp.int32),
        jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2,), jnp.int32),
        deterministic=True,
    )["params"]
    if trunk is not None:
        # deep-merge the checkpoint into the initialized encoder subtree so
        # params the checkpoint lacks (e.g. pooler) keep their fresh init
        def _merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    _merge(dst[k], v)
                else:
                    dst[k] = v

        enc_sub = trunk["encoder"] if "encoder" in trunk else trunk
        params = jax.tree_util.tree_map(lambda x: x, params)  # own the tree
        _merge(params["encoder"], enc_sub)

    tx = optax.adamw(args.learning_rate, weight_decay=0.01)
    state = create_train_state(params, tx)
    step_fn = make_aid_train_step(model, cfg, tx)
    rng = jax.random.PRNGKey(args.seed)
    data_rng = np.random.default_rng(args.seed)
    cls_id, sep_id = special["cls"], special.get("sep", 102)

    # eval examples: no doubling/noise (the reference predicts single rows)
    eval_cfg = dc.replace(cfg, drop_type="none", noisy_type="remain")
    eval_examples = []
    for m in eval_meetings:
        eval_examples.extend(
            build_paired_examples(m["sentences"], eval_cfg, data_rng,
                                  args.context_width, args.use_global_context)
        )

    @jax.jit
    def predict(params, batch):
        logits = model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], batch["sep_position"], deterministic=True,
        )
        return jnp.argmax(logits, -1)

    def evaluate():
        bs = args.per_device_train_batch_size
        preds, labels = [], []
        for s in range(0, len(eval_examples), bs):
            chunk = eval_examples[s : s + bs]
            real = len(chunk)
            while len(chunk) < bs:
                chunk = chunk + chunk[: bs - len(chunk)]
            batch = collate_examples(chunk, tokenize_fn, cfg, cls_id, sep_id)
            out = np.asarray(predict(state.params, {
                k: jnp.asarray(v) for k, v in batch.items() if k != "label"}))
            preds.extend(out[:real].tolist())
            labels.extend(int(c["label"]) for c in chunk[:real])
        return binary_prf(preds, labels)

    bs = args.per_device_train_batch_size
    history, best_f1 = [], -1.0
    for epoch in range(1, args.num_train_epochs + 1):
        examples = []
        for m in train_meetings:
            examples.extend(
                build_paired_examples(m["sentences"], cfg, data_rng,
                                      args.context_width,
                                      args.use_global_context)
            )
        if cfg.drop_type == "none":
            # no consistency pairing: plain example shuffle
            order = data_rng.permutation(len(examples)).tolist()
        else:
            # keep consistency pairs adjacent inside a batch: shuffle PAIRS
            # (paired builders always emit examples two at a time)
            assert len(examples) % 2 == 0, len(examples)
            pair_starts = list(range(0, len(examples), 2))
            data_rng.shuffle(pair_starts)
            order = [i for s in pair_starts for i in (s, s + 1)]
        losses = []
        for s in range(0, len(order), bs):
            take = order[s : s + bs]
            while len(take) < bs:
                take.append(take[0])
            batch = collate_examples([examples[i] for i in take],
                                     tokenize_fn, cfg, cls_id, sep_id)
            state, metrics = step_fn(
                state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
            losses.append(float(metrics["loss"]))
        m = evaluate()
        row = {"epoch": epoch, "train_loss": float(np.mean(losses)),
               "positive_f1": 100 * m["f1"], "precision": 100 * m["precision"],
               "recall": 100 * m["recall"]}
        history.append(row)
        print(json.dumps(row))
        if m["f1"] > best_f1:
            best_f1 = m["f1"]
            from spokennlp_tpu.models import checkpoint_io

            checkpoint_io.save_checkpoint(
                os.path.join(args.output_dir, "best_model"),
                state.params, enc_cfg)
            if getattr(args, "save_hf_format", False):
                from spokennlp_tpu.models import hf_export

                hf_export.save_hf_checkpoint(
                    os.path.join(args.output_dir, "best_model_hf"),
                    jax.device_get(state.params), enc_cfg)

    results = {"history": history, "best_positive_f1": 100 * best_f1}
    with open(os.path.join(args.output_dir, "aid_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    main()
