"""Topic-segmentation fine-tuning CLI.

Drop-in counterpart of the reference's run_finetune.sh ->
ts_sentence_seq_labeling.py main() train path (reference:
emnlp2023-topic_segmentation/run_finetune.sh:60-100). Same flag names; one
process drives all local devices through the jitted SPMD train step instead
of torch.distributed.launch.

Example:
  python -m spokennlp_tpu.cli.run_finetune \
      --dataset_name wiki_section --data_dir ./data/wiki_section \
      --output_dir ./out --do_train --do_eval \
      --ts_loss_weight 1.0 --tssp_loss_weight 1.0 --cl_loss_weight 0.5 \
      --cl_temp 0.1 --cl_anchor_level eop_list --do_tssp --do_da_ts
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
    p.add_argument(
        "--seeds", type=int, nargs="+", default=None,
        help="multi-seed repeats with mean/std aggregation "
        "(the reference's `for seed in 42 59 88` loop, run_finetune.sh:50)",
    )
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)

    if args.seeds and len(args.seeds) > 1:
        from spokennlp_tpu.eval.analysis import compute_avg_std

        per_seed = []
        keys = None
        for seed in args.seeds:
            sub = argparse.Namespace(**vars(args))
            sub.seeds = None
            sub.seed = seed
            sub.output_dir = os.path.join(args.output_dir, f"seed_{seed}")
            res = main_single(sub)
            keys = keys or sorted(k for k, v in res.items() if isinstance(v, (int, float)))
            per_seed.append([float(res.get(k, 0.0)) for k in keys])
        agg = compute_avg_std(per_seed, keys)
        with open(os.path.join(args.output_dir, "multi_seed_results.json"), "w") as f:
            json.dump(agg, f, indent=2)
        print(json.dumps(agg, indent=2))
        return agg
    return main_single(args)


def main_single(args):
    from spokennlp_tpu.cli import common

    os.makedirs(args.output_dir, exist_ok=True)

    import jax.numpy as jnp

    common.maybe_init_distributed(args)
    tokenize_fn, special = common.resolve_tokenizer(args)
    enc_cfg, task_cfg, wcfg, tcfg = common.build_configs(args, special)

    pretrained = common.maybe_load_pretrained(args, enc_cfg)
    params = None
    if pretrained is not None:
        enc_cfg, trunk_params = pretrained
        # tokenizer may have grown (e.g. [BOS] added): resize embeddings so
        # new token ids don't clamp-alias the last pretrained vocab row
        trunk_params, enc_cfg = common.resize_word_embeddings(
            trunk_params, enc_cfg, special["vocab_size"], seed=args.seed
        )

    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from spokennlp_tpu.train.trainer import TopicSegTrainer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = TopicSegModel(enc_cfg, task_cfg, dtype=dtype)

    docs = common.load_docs(args, tokenize_fn)
    trainer = TopicSegTrainer(
        model,
        task_cfg,
        tcfg,
        wcfg,
        train_docs=docs.get("train", []),
        eval_docs=docs.get("validation"),
        metric_for_best=args.metric_for_best_model,
        log_path=os.path.join(args.output_dir, "metrics.jsonl"),
    )
    if pretrained is not None:
        from spokennlp_tpu.parallel import mesh as mesh_lib
        from spokennlp_tpu.train.train_step import create_train_state

        if "encoder" in trunk_params:  # native full task-model checkpoint
            merged = trunk_params
        else:  # converted HF trunk: graft under the encoder scope
            merged = dict(trainer.state.params)
            merged["encoder"] = trunk_params
        merged = mesh_lib.shard_params(merged, trainer.mesh)
        trainer.state = create_train_state(merged, trainer.tx)

    # --resume_from_checkpoint names an explicit checkpoint root; otherwise
    # auto-detect the newest checkpoint under the output dir (HF
    # get_last_checkpoint semantics, ts_sentence_seq_labeling.py:117-129).
    if args.resume_from_checkpoint:
        # an explicit path must resolve: silently training from the wrong
        # state is worse than failing (HF Trainer errors here too)
        if not trainer.restore_latest(args.resume_from_checkpoint):
            raise FileNotFoundError(
                f"--resume_from_checkpoint: no checkpoint under "
                f"{args.resume_from_checkpoint}"
            )
        restored = True
    else:
        restored = trainer.restore_latest()
    if restored:
        print("resumed from checkpoint")

    results = {}
    if args.do_train:
        results.update(trainer.train())
        from spokennlp_tpu.models import checkpoint_io

        checkpoint_io.save_checkpoint(
            os.path.join(args.output_dir, "final_model"),
            trainer.state.params,
            enc_cfg,
        )
        if getattr(args, "save_hf_format", False):
            import jax

            from spokennlp_tpu.models import hf_export

            hf_export.save_hf_checkpoint(
                os.path.join(args.output_dir, "final_model_hf"),
                jax.device_get(trainer.state.params),
                enc_cfg,
                tokenizer_src=args.model_name_or_path
                if args.model_name_or_path and os.path.isdir(args.model_name_or_path)
                else None,
            )
    if args.do_eval:
        results.update({f"eval_{k}": v for k, v in trainer.evaluate().items()})
    if args.do_predict and "test" in docs:
        from spokennlp_tpu.eval.inference import run_topic_seg_inference

        out = run_topic_seg_inference(
            model,
            trainer.state.params,
            docs["test"],
            wcfg,
            batch_size=args.per_device_eval_batch_size,
            threshold=args.threshold,
            topk=args.topk,
            f1_at_k=args.f1_at_k,
            ts_score_predictor=args.ts_score_predictor,
            cos_temp=args.ts_score_predictor_cos_temp,
        )
        results.update({f"predict_{k}": v for k, v in out["metrics"].items()})

    with open(os.path.join(args.output_dir, "all_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
