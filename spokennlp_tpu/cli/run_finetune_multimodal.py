"""MMVTS multimodal fine-tuning CLI.

Counterpart of the reference's run_finetune_multimodal.sh ->
main_multimodal.py (reference: mmvts/run_finetune_multimodal.sh:100-166,
src/main_multimodal.py:90-705): avlecture/clvts clip transcripts are windowed
like emnlp2023 sentences, cached per-clip .npy features are aligned onto the
(B, K) clip grid, the fusion model trains with the composite loss (weighted
ts CE + modality InfoNCE + topic CL matrix/list + MoE balance), the
cross-encoder gets its own learning rate, and eval reports the time-aware
video metrics (clip-F1, 1-Pk/1-WD, bs@k, mIoU).

Feature caches: --vis_feature_dir/--audio_feature_dir hold one
``<lecture>.npy`` of shape (n_clips, H) per video (reference loads the same
way at main_multimodal.py:465-506); missing files fall back to zeros so the
text-only path still runs end to end.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    from spokennlp_tpu.cli import common

    p = argparse.ArgumentParser()
    common.add_model_args(p)
    common.add_data_args(p)
    common.add_training_args(p)
    g = p.add_argument_group("multimodal")
    g.add_argument("--fuse_type", default="cat",
                   choices=["cat", "mean", "max", "text_only", "vis_only",
                            "audio_only", "cat_a_t", "cat_a_v", "cat_t_v"])
    g.add_argument("--cross_encoder_type", default="ma",
                   choices=["ma", "ca", "ma_moe", "ca_moe", "none"])
    g.add_argument("--projector_type", default="linear",
                   choices=["linear", "transformer"])
    g.add_argument("--predictor_hybrid_weight_type", default="p", choices=["p", "l"])
    g.add_argument("--predictor_hybrid_pooling", default="mean", choices=["mean", "max"])
    g.add_argument("--out_modal_prob", action="store_true",
                   help="with a cat fuse, also emit per-modality logit splits")
    g.add_argument("--cross_moe_share_in_layers", action="store_true")
    g.add_argument("--moe_impl", default="dense", choices=["dense", "dispatch"],
                   help="dispatch = GShard-style capacity dispatch (expert-local "
                   "compute under EP; tokens over capacity drop)")
    g.add_argument("--moe_capacity_factor", type=float, default=1.25)
    g.add_argument("--moe_num_experts", type=int, default=4)
    g.add_argument("--moe_top_k", type=int, default=2)
    g.add_argument("--no_cross_moe_residual", action="store_true")
    g.add_argument("--predictor_type", default="linear",
                   choices=["linear", "transformer", "hybrid"])
    g.add_argument("--mm_hidden_size", type=int, default=128)
    g.add_argument("--num_cross_encoder_layers", type=int, default=2)
    g.add_argument("--cross_encoder_lr", type=float, default=None,
                   help="per-module LR for the cross-encoder "
                   "(reference main_multimodal.py:695-705)")
    g.add_argument("--weight_label_zero_mm", type=float, default=0.7)
    g.add_argument("--do_modality_cl", action="store_true")
    g.add_argument("--align_pairs", default="tv",
                   help="comma list from {av,at,tv}, each optionally "
                   "weighted 'tv=0.33' (default weight 0.33 = the "
                   "reference's align_*_weight, mmvts arguments.py:184-203)")
    g.add_argument("--modality_cl_lw", type=float, default=1.0,
                   help="global modality-CL weight (reference "
                   "modality_cl_lw)")
    g.add_argument("--do_topic_mm_cl", action="store_true")
    g.add_argument("--topic_cl_type", default="matrix", choices=["matrix", "list"])
    g.add_argument("--topic_cl_fct", default="simcse", choices=["simcse", "ce"])
    g.add_argument("--topic_cl_choice", default="random", choices=["random", "near"])
    g.add_argument("--topic_cl_pos_k", type=int, default=1)
    g.add_argument("--topic_cl_neg_k", type=int, default=3)
    g.add_argument("--vis_feature_dir", default=None)
    g.add_argument("--audio_feature_dir", default=None)
    g.add_argument("--vis_hidden_size", type=int, default=512)
    g.add_argument("--audio_hidden_size", type=int, default=768)
    g.add_argument("--max_clips_per_window", type=int, default=64)
    g.add_argument("--do_pretrain", action="store_true",
                   help="modality-alignment pretraining objective only "
                   "(reference: mmvts/src/pretrain.py)")
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.cli.common import resolve_tokenizer
    from spokennlp_tpu.data import corpora
    from spokennlp_tpu.models.multimodal import MultimodalConfig
    from spokennlp_tpu.objectives.mmvts_losses import build_topic_cl_list_indices
    from spokennlp_tpu.parallel import mesh as mesh_lib
    from spokennlp_tpu.projects.mmvts import (
        MMVTSModel,
        featurize_video,
        make_mmvts_pretrain_step,
        make_mmvts_train_step,
    )
    from spokennlp_tpu.train import optim
    from spokennlp_tpu.train.train_step import create_train_state

    common.maybe_init_distributed(args)
    tokenize_fn, special = resolve_tokenizer(args)
    enc_cfg, _task, wcfg, tcfg = common.build_configs(args, special)

    # pretrained text trunk (reference parity: TextEncoder wraps a pretrained
    # BERT/Longformer checkpoint, mmvts/src/models/text_encoder/
    # text_encoder.py:4-89); native and HF torch checkpoint dirs both convert
    pretrained = common.maybe_load_pretrained(args, enc_cfg)
    trunk_params = None
    if pretrained is not None:
        import dataclasses as dc

        loaded_cfg, trunk_params = pretrained
        trunk_params, loaded_cfg = common.resize_word_embeddings(
            trunk_params, loaded_cfg, special["vocab_size"], seed=tcfg.seed
        )
        enc_cfg = dc.replace(
            loaded_cfg, add_pooler=False, attention_type=enc_cfg.attention_type
        )

    mm_cfg = MultimodalConfig(
        hidden_size=args.mm_hidden_size,
        text_hidden_size=enc_cfg.hidden_size,
        vis_hidden_size=args.vis_hidden_size,
        audio_hidden_size=args.audio_hidden_size,
        projector_type=args.projector_type,
        cross_encoder_type=args.cross_encoder_type,
        num_cross_encoder_layers=args.num_cross_encoder_layers,
        fuse_type=args.fuse_type,
        predictor_type=args.predictor_type,
        predictor_hybrid_weight_type=args.predictor_hybrid_weight_type,
        predictor_hybrid_pooling=args.predictor_hybrid_pooling,
        out_modal_prob=args.out_modal_prob,
        moe_share_in_layers=args.cross_moe_share_in_layers,
        moe_impl=args.moe_impl,
        moe_capacity_factor=args.moe_capacity_factor,
        moe_num_experts=args.moe_num_experts,
        moe_top_k=args.moe_top_k,
        moe_residual=not args.no_cross_moe_residual,
    )
    K = args.max_clips_per_window

    def load_feats(lecture, n_clips):
        feats = {}
        for mod, d, width in (
            ("vis", args.vis_feature_dir, args.vis_hidden_size),
            ("audio", args.audio_feature_dir, args.audio_hidden_size),
        ):
            if mod not in mm_cfg.modalities:
                continue
            path = d and os.path.join(d, f"{lecture}.npy")
            if path and os.path.exists(path):
                feats[mod] = np.load(path)[:n_clips].astype(np.float32)
            else:
                feats[mod] = np.zeros((n_clips, width), np.float32)
        return feats

    splits = corpora.load_dataset_splits(args.dataset_name, args.data_dir)
    windows = {}
    _clip_times = {}
    for split, examples in splits.items():
        limit = {"train": args.max_train_samples,
                 "validation": args.max_eval_samples,
                 "test": args.max_predict_samples}[split]
        if limit:
            examples = examples[:limit]
        rows = []
        by_id = {e["example_id"]: e for e in examples}
        for ex in corpora.tokenize_examples(examples, tokenize_fn):
            src = by_id.get(ex["example_id"], {})
            lecture = src.get("lecture", str(ex["example_id"]))
            inv_labels = [1 if l == 0 else 0 for l in ex["labels"]]  # to EOT=1
            rows.extend(
                featurize_video(
                    ex["sent_token_ids"], inv_labels,
                    load_feats(lecture, len(ex["labels"])),
                    wcfg, example_id=ex["example_id"],
                    max_clips_per_window=K,
                )
            )
        windows[split] = rows
        # real per-clip end seconds for the time-aware eval (fallback: a
        # uniform 10 s grid when the corpus carries no timestamps)
        for e in examples:
            secs = e.get("clip_end_seconds")
            _clip_times[e["example_id"]] = (
                [float(v) for v in secs] if secs else None
            )

    model = MMVTSModel(enc_cfg, mm_cfg,
                       dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    train_rows = windows.get("train", [])
    assert train_rows, "no training windows"
    ex0 = train_rows[0]
    params = model.init(
        jax.random.PRNGKey(tcfg.seed),
        jnp.asarray(ex0["input_ids"][None]),
        jnp.asarray(ex0["attention_mask"][None]),
        jnp.asarray(ex0["clip_positions"][None]),
        jnp.asarray(ex0["clip_mask"][None]),
        vis_feats=jnp.asarray(ex0["vis_feats"][None]) if "vis_feats" in ex0 else None,
        audio_feats=jnp.asarray(ex0["audio_feats"][None]) if "audio_feats" in ex0 else None,
    )["params"]
    if trunk_params is not None:
        # deep-merge the checkpoint into the text-encoder subtree; params the
        # checkpoint lacks keep their fresh init (run_aid pattern)
        def _merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    _merge(dst[k], v)
                else:
                    dst[k] = v

        enc_sub = trunk_params
        for key in ("text_encoder", "encoder"):
            if key in enc_sub:
                enc_sub = enc_sub[key]
                break
        params = jax.tree_util.tree_map(lambda x: x, params)  # own the tree
        _merge(params["text_encoder"], enc_sub)

    mesh = mesh_lib.make_mesh(tcfg.model_parallel_size)
    params = mesh_lib.shard_params(params, mesh)

    if args.cross_encoder_lr:
        tx = optim.make_module_lr_optimizer(
            args.learning_rate,
            {"cross_encoder": args.cross_encoder_lr},
            weight_decay=args.weight_decay,
        )
    else:
        tx = optim.make_optimizer(tcfg, total_steps=1000)
    state = create_train_state(params, tx)

    align_pairs = {}
    for entry in args.align_pairs.split(","):
        entry = entry.strip()
        if not entry:
            continue
        if "=" in entry:
            k, w = entry.split("=", 1)
            align_pairs[k] = float(w)
        else:
            # reference default per-pair weight (align_*_weight = 0.33)
            align_pairs[entry] = 0.33
    loss_kwargs = dict(
        weight_label_zero=args.weight_label_zero_mm,
        do_modality_cl=args.do_modality_cl,
        align_pairs=align_pairs,
        modality_cl_lw=args.modality_cl_lw,
        cl_temp=args.cl_temp,
        do_topic_mm_cl=args.do_topic_mm_cl,
        topic_cl_type=args.topic_cl_type,
        topic_cl_fct=args.topic_cl_fct,
    )
    if args.do_pretrain:
        step_fn = make_mmvts_pretrain_step(model, tx, align_pairs, args.cl_temp)
    else:
        step_fn = make_mmvts_train_step(model, tx, loss_kwargs)

    feat_keys = [k for k in ex0 if k.endswith("_feats")]
    batch_keys = ["input_ids", "attention_mask", "clip_positions", "clip_mask",
                  "clip_labels"] + feat_keys
    dp = mesh.shape[mesh_lib.DATA_AXIS]
    bs = max(tcfg.per_device_batch_size * dp, dp)
    data_rng = np.random.default_rng(tcfg.seed)
    rng = jax.random.PRNGKey(tcfg.seed)

    history = []
    if args.do_train:
        for epoch in range(int(args.num_train_epochs)):
            order = data_rng.permutation(len(train_rows))
            for s in range(0, len(order), bs):
                take = order[s : s + bs].tolist()
                while len(take) < bs:
                    take.append(take[0])
                chunk = [train_rows[i] for i in take]
                batch = {k: np.stack([c[k] for c in chunk]) for k in batch_keys}
                if args.do_topic_mm_cl and args.topic_cl_type == "list":
                    idx = build_topic_cl_list_indices(
                        batch["clip_labels"], batch["clip_mask"],
                        args.topic_cl_pos_k, args.topic_cl_neg_k,
                        args.topic_cl_choice, data_rng,
                    )
                    batch["topic_cl_anchor_valid"] = idx["anchor_valid"]
                    batch["topic_cl_pos"] = idx["pos"]
                    batch["topic_cl_neg"] = idx["neg"]
                jb = mesh_lib.shard_batch(batch, mesh)
                state, metrics = step_fn(state, jb, rng)
            history.append({"epoch": epoch + 1,
                            **{k: float(v) for k, v in metrics.items()}})
            print(json.dumps(history[-1]))

    results = {"history": history}
    eval_rows = windows.get("validation") or windows.get("test") or []
    if (args.do_eval or args.do_predict) and eval_rows and not args.do_pretrain:
        from spokennlp_tpu.eval.video_metrics import evaluate_video_corpus

        @jax.jit
        def predict(params, batch):
            out = model.apply(
                {"params": params},
                batch["input_ids"], batch["attention_mask"],
                batch["clip_positions"], batch["clip_mask"],
                vis_feats=batch.get("vis_feats"),
                audio_feats=batch.get("audio_feats"),
                deterministic=True,
            )
            return jnp.argmax(out["logits"], -1)

        per_video = {}
        for s in range(0, len(eval_rows), bs):
            chunk = eval_rows[s : s + bs]
            real = len(chunk)
            while len(chunk) < bs:
                chunk = chunk + chunk[: bs - len(chunk)]
            batch = {k: np.stack([c[k] for c in chunk]) for k in batch_keys}
            preds = np.asarray(predict(state.params, {
                k: jnp.asarray(v) for k, v in batch.items()}))
            for i in range(real):
                row = chunk[i]
                vid = row["example_id"]
                d = per_video.setdefault(vid, {"labels": {}, "preds": {}})
                for k in range(K):
                    if row["clip_mask"][k]:
                        cid = int(row["clip_ids"][k])
                        d["labels"][cid] = int(row["clip_labels"][k])
                        d["preds"][cid] = int(preds[i, k])
        examples = []
        for vid, d in per_video.items():
            cids = sorted(d["labels"])
            times = _clip_times.get(vid)
            examples.append({
                "example_id": vid,
                "labels": [d["labels"][c] for c in cids],
                "preds": [d["preds"][c] for c in cids],
                "clip_end_seconds": (
                    [times[c] for c in cids]
                    if times and max(cids) < len(times)
                    else [float(c + 1) * 10.0 for c in cids]
                ),
            })
        results["eval"] = evaluate_video_corpus(examples)
        print(json.dumps(results["eval"], indent=2))

    with open(os.path.join(args.output_dir, "mm_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    main()
