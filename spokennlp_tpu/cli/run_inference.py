"""Topic-segmentation inference CLI (the north-star benchmark path).

Counterpart of run_inference.sh -> main() with do_predict
(reference: emnlp2023-topic_segmentation/src/ts_sentence_seq_labeling.py:
1119-1224): windowed prediction, per-document re-aggregation, example-level
threshold/topk/f1@k metrics, prediction jsonl output.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    from spokennlp_tpu.cli import common

    p = argparse.ArgumentParser()
    common.add_model_args(p)
    common.add_data_args(p)
    common.add_training_args(p)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    common.maybe_init_distributed(args)
    tokenize_fn, special = common.resolve_tokenizer(args)
    enc_cfg, task_cfg, wcfg, tcfg = common.build_configs(args, special)
    pretrained = common.maybe_load_pretrained(args, enc_cfg)
    if pretrained is not None:
        enc_cfg2, trunk_params = pretrained
        trunk_params, enc_cfg2 = common.resize_word_embeddings(
            trunk_params, enc_cfg2, special["vocab_size"], seed=tcfg.seed
        )
        pretrained = (enc_cfg2, trunk_params)
        enc_cfg = enc_cfg2

    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from spokennlp_tpu.eval.inference import run_topic_seg_inference

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = TopicSegModel(enc_cfg, task_cfg, dtype=dtype)

    docs = common.load_docs(args, tokenize_fn)
    test_docs = docs.get("test") or docs.get("validation") or []
    assert test_docs, "no test/validation split found"

    L = wcfg.max_seq_length
    params = model.init(
        jax.random.PRNGKey(tcfg.seed),
        jnp.ones((1, L), jnp.int32),
        attention_mask=jnp.ones((1, L), jnp.int32),
        deterministic=True,
    )["params"]
    if pretrained is not None:
        enc_cfg2, trunk_params = pretrained
        if "encoder" in trunk_params:  # native full task-model checkpoint
            params = trunk_params
        else:
            params = dict(params)
            params["encoder"] = trunk_params

    from spokennlp_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(args.model_parallel_size)
    params = mesh_lib.shard_params(params, mesh)
    dp = mesh.shape[mesh_lib.DATA_AXIS]

    t0 = time.time()
    out = run_topic_seg_inference(
        model,
        params,
        test_docs,
        wcfg,
        mesh=mesh,
        batch_size=args.per_device_eval_batch_size * dp,
        threshold=args.threshold,
        topk=args.topk,
        f1_at_k=args.f1_at_k,
        ts_score_predictor=args.ts_score_predictor,
        cos_temp=args.ts_score_predictor_cos_temp,
    )
    t1 = time.time()
    print("predict_time(s): ", t1 - t0)

    metric_name = "_".join(
        ["predict", args.test_data_name, f"max_seq{args.max_seq_length}",
         f"ts_score_{args.ts_score_predictor}"]
    )
    pred_file = os.path.join(args.output_dir, metric_name + ".txt")
    with open(pred_file, "w") as f:
        for doc, res in zip(test_docs, out["per_doc"]):
            import numpy as np

            if not len(res["labels"]):
                preds = []
            elif res["scores"].ndim == 2:
                preds = np.argmax(res["scores"], -1).tolist()
            else:  # cos predictor: sigmoid-sim > 0.5 -> similar -> O (1)
                preds = (res["scores"] > 0.5).astype(np.int32).tolist()
            f.write(
                json.dumps(
                    {
                        "sentences": doc.get("sentences", []),
                        "labels": ["B-EOP" if l == 0 else "O" for l in res["labels"]],
                        "int_labels": [int(v) for v in res["labels"]],
                        "predictions": ["B-EOP" if p == 0 else "O" for p in preds],
                        "predict_logits": res["scores"].tolist(),
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    with open(os.path.join(args.output_dir, metric_name + "_results.json"), "w") as f:
        json.dump(out["metrics"], f, indent=2, default=float)
    print(json.dumps(out["metrics"], indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
