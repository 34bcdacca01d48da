"""MUG challenge track driver: Track 1 (topic segmentation), Track 2
(extractive summarization), Track 4 (keyphrase extraction).

Counterpart of the reference's per-track mains (reference:
alimeeting4mug/src/topic_segment/ponet_topic_segmentation.py:254-911,
extractive_summarization/ponet_extractive_summarization.py, and the AdaSeq
Bert-CRF keyphrase recipe at src/keyphrase_extraction/README.md): train on
MUG meeting jsonl, write predictions + the official submission files, and
score with the challenge evaluator. Tracks 3 and 5 have their own drivers
(cli/run_title_generation.py, cli/run_aid.py).

Tracks 1 and 2 use the PoNet token-classification stack (per-token
segment_ids, EOS-marked windows); Track 4 uses the BERT-CRF tagger with
char-level BIO tags.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--track", required=True,
                   choices=["topic_segmentation", "extractive_summarization",
                            "keyphrase"])
    p.add_argument("--train_file", required=True)
    p.add_argument("--eval_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--vocab_file", default=None,
                   help="WordPiece vocab for the built-in FullTokenizer")
    p.add_argument("--init_checkpoint", default=None,
                   help="native checkpoint dir (params.msgpack [+config.json])"
                        " to initialize the PoNet trunk (+head) from — the"
                        " from_pretrained equivalent of the reference"
                        " (modeling_ponet.py:41)")
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--es_level", default="topic", choices=["topic", "doc"])
    p.add_argument("--annotator_strategy", default="single",
                   choices=["single", "union", "major_vote", "pool"])
    p.add_argument("--es_top_ratio", type=float, default=None)
    p.add_argument("--kpe_top_k", type=int, default=20)
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
    from spokennlp_tpu.configs import EncoderConfig, WindowingConfig
    from spokennlp_tpu.projects.mug import data as mug_data
    from spokennlp_tpu.projects.mug import evaluate as mug_eval
    from spokennlp_tpu.train.train_step import create_train_state

    ns = argparse.Namespace(model_name_or_path=args.model_name_or_path,
                            vocab_file=args.vocab_file)
    tokenize_fn, special = common.resolve_tokenizer(ns)
    eos_id = special.get("sep", 102)

    ckpt_params = ckpt_cfg = None
    if args.init_checkpoint:
        from spokennlp_tpu.models import checkpoint_io

        ckpt_params, ckpt_cfg = checkpoint_io.load_checkpoint(
            args.init_checkpoint)

    enc_cfg = ckpt_cfg if ckpt_cfg is not None else EncoderConfig(
        vocab_size=special["vocab_size"],
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_position_embeddings=max(args.max_seq_length, 512),
        pad_token_id=special["pad"],
        add_pooler=False,
    )
    wcfg = WindowingConfig(
        max_seq_length=args.max_seq_length,
        cls_token_id=special["cls"],
        pad_token_id=special["pad"],
        bos_token_id=special["bos"],
    )

    train_meetings = mug_data.read_jsonl(args.train_file)
    eval_meetings = mug_data.read_jsonl(args.eval_file)
    rng = jax.random.PRNGKey(args.seed)
    data_rng = np.random.default_rng(args.seed)
    bs = args.per_device_train_batch_size
    results = {}

    def run_epochs(step_fn, state, batch_arrays, keys):
        n = batch_arrays[keys[0]].shape[0]
        for _ in range(args.num_train_epochs):
            order = data_rng.permutation(n)
            for s in range(0, n, bs):
                take = order[s : s + bs].tolist()
                while len(take) < bs:
                    take.append(take[0])
                jb = {k: jnp.asarray(batch_arrays[k][take]) for k in keys}
                state, metrics = step_fn(state, jb, rng)
            results.setdefault("train_loss", []).append(float(metrics["loss"]))
        return state

    if args.track in ("topic_segmentation", "extractive_summarization"):
        from spokennlp_tpu.models.ponet import PoNetForTokenClassification
        from spokennlp_tpu.projects.mug.topic_segmentation import (
            make_ponet_train_step,
            predict_boundaries,
            stack_eos_windows,
            window_document_eos,
        )

        model = PoNetForTokenClassification(enc_cfg)
        L = wcfg.max_seq_length
        params = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.ones((1, L), jnp.int32),
            attention_mask=jnp.ones((1, L), jnp.int32),
            segment_ids=jnp.zeros((1, L), jnp.int32),
            deterministic=True,
        )["params"]
        if ckpt_params is not None:
            # full-model tree, or a bare trunk (hf_convert.ponet_to_encoder_
            # params output) that keeps the fresh classifier head
            if "ponet" in ckpt_params:
                params = jax.tree_util.tree_map(jnp.asarray, ckpt_params)
            else:
                params = dict(params)
                params["ponet"] = jax.tree_util.tree_map(
                    jnp.asarray, ckpt_params)
        tx = optax.adamw(args.learning_rate, weight_decay=0.01)
        state = create_train_state(params, tx)
        step_fn = make_ponet_train_step(model, tx)
        keys = ("input_ids", "attention_mask", "segment_ids", "labels")

        if args.track == "topic_segmentation":
            windows = []
            for eid, m in enumerate(train_meetings):
                parsed = mug_data.parse_topic_segmentation(m)
                sent_tokens = [tokenize_fn(s) for s in parsed["sentences"]]
                windows.extend(window_document_eos(
                    sent_tokens, parsed["labels"], wcfg, eos_id, example_id=eid))
            state = run_epochs(step_fn, state, stack_eos_windows(windows), keys)

            parsed_eval = [mug_data.parse_topic_segmentation(m)
                           for m in eval_meetings]
            boundaries = predict_boundaries(
                model, state.params, parsed_eval, tokenize_fn, wcfg, eos_id,
                batch_size=bs)
            sub = mug_data.topic_segmentation_submission(
                [m.get("meeting_key", "") for m in eval_meetings], boundaries)
            results["metrics"] = mug_eval.topic_segment_evaluate(
                eval_meetings, sub)
        else:
            from spokennlp_tpu.projects.mug.extractive_summarization import (
                evaluate_es_rouge,
                featurize_es_examples,
                predict_key_sentences,
            )

            _, train_windows = featurize_es_examples(
                train_meetings, tokenize_fn, wcfg, eos_id,
                level=args.es_level,
                annotator_strategy=args.annotator_strategy)
            state = run_epochs(step_fn, state,
                               stack_eos_windows(train_windows), keys)

            examples, eval_windows = featurize_es_examples(
                eval_meetings, tokenize_fn, wcfg, eos_id,
                level=args.es_level,
                annotator_strategy=args.annotator_strategy)
            preds = predict_key_sentences(
                model, state.params, examples, eval_windows, batch_size=bs,
                top_ratio=args.es_top_ratio)
            results["metrics"] = evaluate_es_rouge(examples, preds)
            # submission in the official format: per-topic key sentences
            # (topic id = segment-end sentence id, matching the label file)
            # plus the doc-level union — scoreable by run_mug_evaluate
            keys = [m.get("meeting_key", "") for m in eval_meetings]
            by_meeting = {k: {"topics": [], "doc": []} for k in keys}
            for ex, ids in zip(examples, preds):
                off0, off1 = ex.get("topic_span", (0, len(ex["sentences"])))
                glob = sorted(int(i + off0) for i in ids)
                d = by_meeting[ex["meeting_key"]]
                d["topics"].append({"id": int(off1), "key_sentence": glob})
                d["doc"].extend(glob)
            sub = mug_data.extractive_summarization_submission(
                keys,
                [by_meeting[k]["topics"] for k in keys],
                [sorted(set(by_meeting[k]["doc"])) for k in keys])
            if args.es_level == "topic" and args.annotator_strategy != "pool":
                try:
                    results["official"] = (
                        mug_eval.extractive_summarization_evaluate(
                            eval_meetings, sub))
                except (KeyError, AssertionError) as e:
                    # label file lacks doc-level key_sentence candidates (or
                    # topic counts mismatch) — rouge metrics above still hold
                    results["official_error"] = f"{type(e).__name__}: {e}"
    else:  # keyphrase (Track 4): BERT-CRF over char tokens
        from spokennlp_tpu.projects.mug.keyphrase import (
            BertCrfTagger,
            bio_tags_from_keyphrases,
            decode_tags,
            extract_keyphrases,
        )

        model = BertCrfTagger(enc_cfg)
        L = wcfg.max_seq_length

        def featurize_kpe(meetings, with_tags):
            rows = []
            for m in meetings:
                parsed = mug_data.parse_keyphrases(m)
                kps = [list(k) for k in parsed["key_words"]]
                for sent in parsed["sentences"]:
                    chars = list(sent)[: L]
                    # char-aligned ids (one id per char) keep BIO tags aligned
                    char_toks = [tokenize_fn(c) for c in chars]
                    ids = [t[0] if t else special["pad"] for t in char_toks]
                    tags = bio_tags_from_keyphrases(chars, kps) if with_tags else [0] * len(chars)
                    n = len(ids)
                    row = {
                        "input_ids": np.pad(np.asarray(ids, np.int32), (0, L - n)),
                        "attention_mask": np.pad(np.ones(n, np.int32), (0, L - n)),
                        "tags": np.pad(np.asarray(tags, np.int32), (0, L - n)),
                        "tokens": chars,
                        "meeting_key": parsed["meeting_key"],
                    }
                    rows.append(row)
            return rows

        train_rows = featurize_kpe(train_meetings, with_tags=True)
        params = model.init(
            jax.random.PRNGKey(args.seed),
            jnp.ones((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
            tags=jnp.zeros((1, L), jnp.int32), deterministic=True,
        )["params"]
        if ckpt_params is not None:
            # full tagger tree, or a bare trunk (hf_convert.bert_to_encoder_
            # params output) keeping the fresh emissions head + transitions
            if "encoder" in ckpt_params:
                params = jax.tree_util.tree_map(jnp.asarray, ckpt_params)
            else:
                params = dict(params)
                params["encoder"] = jax.tree_util.tree_map(
                    jnp.asarray, ckpt_params)
        tx = optax.adamw(args.learning_rate, weight_decay=0.01)
        state = create_train_state(params, tx)

        from spokennlp_tpu.train.train_step import TrainState

        @jax.jit
        def kpe_step(state, batch, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, batch["input_ids"], batch["attention_mask"],
                    tags=batch["tags"], deterministic=False,
                    rngs={"dropout": rng})
                return out["loss"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            up, opt = tx.update(grads, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, up),
                              opt_state=opt), {"loss": loss}

        arrays = {k: np.stack([r[k] for r in train_rows])
                  for k in ("input_ids", "attention_mask", "tags")}
        state = run_epochs(kpe_step, state, arrays,
                           ("input_ids", "attention_mask", "tags"))

        eval_rows = featurize_kpe(eval_meetings, with_tags=False)
        per_meeting_tokens, per_meeting_tags, per_meeting_masks = {}, {}, {}
        for s in range(0, len(eval_rows), bs):
            chunk = eval_rows[s : s + bs]
            real = len(chunk)
            while len(chunk) < bs:
                chunk = chunk + chunk[: bs - len(chunk)]
            tags = decode_tags(
                model, state.params,
                np.stack([r["input_ids"] for r in chunk]),
                np.stack([r["attention_mask"] for r in chunk]))
            for r, t in zip(chunk[:real], tags[:real]):
                mk = r["meeting_key"]
                per_meeting_tokens.setdefault(mk, []).append(r["tokens"])
                per_meeting_tags.setdefault(mk, []).append(t.tolist())
                per_meeting_masks.setdefault(mk, []).append(
                    r["attention_mask"].tolist())
        keys = list(per_meeting_tokens)
        kws = [
            extract_keyphrases(per_meeting_tokens[k], per_meeting_tags[k],
                               per_meeting_masks[k], top_k=args.kpe_top_k)
            for k in keys
        ]
        sub = mug_data.keyphrase_submission(keys, kws)
        by_key = {m.get("meeting_key", ""): m for m in eval_meetings}
        label_samples = [by_key[k] for k in keys]  # same order as sub
        results["metrics"] = mug_eval.keyphrase_extraction_evaluate(
            label_samples, sub)

    with open(os.path.join(args.output_dir, "submission.jsonl"), "w") as f:
        for row in sub:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    with open(os.path.join(args.output_dir, f"{args.track}_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results.get("metrics", {}), indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
