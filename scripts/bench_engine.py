"""End-to-end engine benchmark at serving depths (BENCH_ENGINE artifact).

Round-4 verdict missing #2: the 22k w/s headline was only ever measured by
the pre-staged bench.py harness (corpus already on device, one scalar
fetch); the user-facing engine path — raw jsonl -> tokenize -> window ->
upload -> scan -> download -> aggregate -> Pk/WD — was never measured at the
serving depth. This script measures, per depth, in one session on the chip:

  bench_dense    the bench.py harness number (device ceiling)
  cached         run_topic_seg_inference over PRE-featurized windows — the
                 reference's own protocol (cached datasets.map + timed
                 trainer.predict, ts_sentence_seq_labeling.py:945-954,
                 :1131-1136); includes upload/scan/fetch/aggregate/metrics
  stream_pretok  eval/streaming.py over pre-tokenized docs: window +
                 upload + scan + fetch + aggregate + metrics, featurization
                 overlapping device compute
  stream_raw     same with WordPiece tokenization inside the stream (the
                 full raw-text path)

Corpus: fullscale-profile synthetic docs (scripts/parity_e2e.py PROFILES),
~512-token windows, sized per depth for >= ~1.3 s of device work (bench.py's
equal-time rule). Model: the bench.py serving config (W8A8, attention auto,
bf16) with random weights — throughput does not depend on weight values.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import parity_e2e  # noqa: E402


def build_corpus(n_docs: int, seed: int = 0):
    import random

    rng = random.Random(seed)
    return [parity_e2e.gen_document(rng, "fullscale") for _ in range(n_docs)]


def tokenizer_for_bench():
    """Word-level vocab tokenizer over the synthetic corpus vocabulary,
    mapped into the bench model's 30522-id space."""
    from transformers import BertTokenizerFast

    vocab_path = "/tmp/bench_engine_vocab.txt"
    parity_e2e.write_vocab(vocab_path)
    return BertTokenizerFast(vocab_path, do_lower_case=True)


def prepare_docs(raw_docs, tok):
    all_sents = [s for d in raw_docs for s in d["sentences"]]
    enc = tok(all_sents, add_special_tokens=False)["input_ids"]
    docs, i = [], 0
    for d in raw_docs:
        k = len(d["sentences"])
        docs.append({"sent_token_ids": enc[i : i + k], "labels": d["labels"]})
        i += k
    return docs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="1,2,4,6,12")
    ap.add_argument("--docs", type=int, default=2000,
                    help="base corpus size at 12L; scaled by 12/depth "
                    "(equal-time rule)")
    ap.add_argument("--raw-docs", type=int, default=600,
                    help="corpus for the raw-text mode (host-tokenizer-bound)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--chunk-batches", type=int, default=2)
    ap.add_argument("--sent-k", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="BENCH_ENGINE_r05.json")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from spokennlp_tpu.configs import WindowingConfig
    from spokennlp_tpu.data.windowing_fast import window_documents_stacked
    from spokennlp_tpu.eval.inference import run_topic_seg_inference
    from spokennlp_tpu.eval.streaming import stream_topic_seg_inference

    tok = tokenizer_for_bench()
    vocab = tok.get_vocab()
    wcfg = WindowingConfig(max_seq_length=512, cls_token_id=vocab["[CLS]"],
                           pad_token_id=vocab["[PAD]"],
                           bos_token_id=vocab["[BOS]"])
    tokenize_fn = lambda sents: tok(sents, add_special_tokens=False)["input_ids"]

    depths = [int(d) for d in args.depths.split(",")]
    rows = {}
    for depth in depths:
        model = bench.make_model(depth, 512, "auto", "w8a8")
        params = model.init(
            jax.random.PRNGKey(0),
            jax.numpy.ones((2, 512), jax.numpy.int32),
            attention_mask=jax.numpy.ones((2, 512), jax.numpy.int32),
            deterministic=True,
        )["params"]

        n_docs = args.docs * max(12 // depth, 1) // 4
        raw_docs = build_corpus(n_docs)
        docs = prepare_docs(raw_docs, tok)

        # bench.py harness number (device ceiling), equal-time sizing
        nb = 24 * max(12 // depth, 1)
        dense = bench.bench_dense(model, args.batch_size, 512, nb, 2)

        # cached: featurize fully (NOT timed), time predict+aggregate+metrics
        stacked = window_documents_stacked(docs, wcfg)
        nw = stacked["input_ids"].shape[0]
        cached_best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = run_topic_seg_inference(model, params, docs, wcfg,
                                          batch_size=args.batch_size,
                                          threshold=0.5)
            dt = time.perf_counter() - t0
            cached_best = dt if cached_best is None else min(cached_best, dt)
        # run_topic_seg_inference re-featurizes inside; subtract that cost
        t0 = time.perf_counter()
        _ = window_documents_stacked(docs, wcfg)
        refeat = time.perf_counter() - t0

        stream_best = None
        stream_timing = None
        for _ in range(args.repeats):
            out = stream_topic_seg_inference(
                model, params, docs, wcfg, batch_size=args.batch_size,
                chunk_batches=args.chunk_batches, sent_k=args.sent_k,
                threshold=0.5)
            if stream_best is None or out["timing"]["total"] < stream_best:
                stream_best = out["timing"]["total"]
                stream_timing = out["timing"]
        assert out["timing"]["windows"] == nw

        raw_sub = build_corpus(args.raw_docs, seed=1)
        raw_out = stream_topic_seg_inference(
            model, params, raw_sub, wcfg, batch_size=args.batch_size,
            chunk_batches=args.chunk_batches, sent_k=args.sent_k,
            threshold=0.5, tokenize_fn=tokenize_fn)

        rows[str(depth)] = {
            "windows": nw,
            "bench_dense_w_per_s": round(dense, 1),
            "cached_predict_w_per_s": round(nw / max(cached_best - refeat, 1e-9), 1),
            "stream_pretok_w_per_s": round(nw / stream_best, 1),
            "stream_pretok_timing": stream_timing,
            "stream_raw_w_per_s": raw_out["timing"]["windows_per_sec"],
            "stream_raw_timing": raw_out["timing"],
            "engine_vs_bench": round(nw / stream_best / dense, 4),
            "cached_vs_bench": round(nw / max(cached_best - refeat, 1e-9) / dense, 4),
        }
        print(json.dumps({depth: rows[str(depth)]}, indent=2), flush=True)

    result = {
        "what": (
            "End-to-end engine throughput vs the pre-staged bench.py "
            "harness, per serving depth, one session on the chip "
            "(scripts/bench_engine.py). cached = the reference's own "
            "protocol (featurization cached, predict timed); stream_* = "
            "single-pass pipeline incl. featurization overlapped with "
            "device compute; stream_raw adds WordPiece tokenization. "
            "Host = 1 CPU core; device link = axon tunnel (~20-50 MB/s, "
            "ROUND1_NOTES.md)."
        ),
        "batch_size": args.batch_size,
        "chunk_batches": args.chunk_batches,
        "sent_k": args.sent_k,
        "depths": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if not kk.endswith("timing")}
                      for k, v in rows.items()}, indent=2))


if __name__ == "__main__":
    main()
