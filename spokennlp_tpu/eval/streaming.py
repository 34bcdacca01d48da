"""Streamed host->device inference: featurize WHILE the chip computes.

The reference amortizes featurization with a cached ``datasets.map`` and
measures predict time over the pre-featurized dataset (reference:
emnlp2023-topic_segmentation/src/ts_sentence_seq_labeling.py:945-954 cached
map, :1131-1136 timed predict). This engine instead runs the WHOLE pipeline —
(tokenize ->) window -> upload -> scan -> download -> aggregate -> metrics —
as a single-pass pipeline in which host featurization of chunk k+1 overlaps
the device's compute of chunk k (XLA dispatch is async; D2H is started for
every chunk before the first fetch blocks):

  featurize c0 | dispatch c0 | featurize c1 | dispatch c1 | ... |
               |  device: c0 |  device: c1 (c0 D2H in flight) | ...

Host hot paths are the vectorized batch featurizer
(data/windowing_fast.window_documents_stacked, ~32k w/s on one host core vs
5k for the per-sentence walk) and the vectorized metric kernels
(eval/seg_metrics). The device program is the same on-device lax.scan used
by eval/inference.predict_windows_scanned, with logits gathered at sentence
positions on device so only (B, K, C) crosses the link per batch.

scripts/bench_engine.py measures this engine against the pre-staged
bench.py harness at every serving depth (BENCH_ENGINE artifact).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

from spokennlp_tpu.data.windowing_fast import window_documents_stacked
from spokennlp_tpu.eval.inference import make_scan_predict_fn

IGNORE = -100


class _Aggregator:
    """Incremental per-document gathering of window predictions.

    Same contract as windowing.aggregate_gathered_predictions, fed chunk by
    chunk in window order."""

    def __init__(self, num_docs: int):
        self.labels: List[List[int]] = [[] for _ in range(num_docs)]
        self.scores: List[List[np.ndarray]] = [[] for _ in range(num_docs)]

    def add_chunk(self, example_id, sent_labels, gathered_scores):
        for wi in range(sent_labels.shape[0]):
            live = sent_labels[wi] != IGNORE
            if not live.any():
                continue
            eid = int(example_id[wi])
            self.labels[eid].extend(sent_labels[wi][live].tolist())
            self.scores[eid].append(gathered_scores[wi][live])

    def per_doc(self, n_classes: int):
        out = []
        for lab, sc in zip(self.labels, self.scores):
            scores = (np.concatenate(sc, 0) if sc
                      else np.zeros((0, n_classes), np.float32))
            out.append({"labels": np.asarray(lab, np.int32),
                        "scores": scores})
        return out


def stream_topic_seg_inference(
    model,
    params,
    docs: Sequence[Dict],
    windowing_cfg,
    batch_size: int = 128,
    chunk_batches: int = 2,
    sent_k: int = 64,
    threshold: Optional[float] = 0.5,
    topk: Optional[int] = None,
    f1_at_k: Optional[int] = None,
    tokenize_fn: Optional[Callable] = None,
    docs_per_group: int = 64,
    mesh=None,
    compute_metrics: bool = True,
) -> Dict:
    """Single-pass streamed inference over a document corpus.

    Args:
      docs: tokenized docs {"sent_token_ids", "labels"} — or, with
        ``tokenize_fn``, raw docs {"sentences": [str], "labels"} tokenized
        group by group inside the stream (so tokenization also overlaps
        device compute).
      sent_k: padded sentence-slot count for the on-device gather. Must be
        >= the max sentences in any window (asserted); far smaller than the
        windowing default L//2+1, which cuts D2H by ~4-8x.
      docs_per_group: featurization granularity; each group's windows are
        appended to a buffer that drains in fixed (chunk_batches, B) chunks.

    Returns {"metrics", "per_doc", "timing"}; timing breaks the wall into
    featurize / dispatch(+upload) / fetch / aggregate / metrics seconds.
    """
    import jax
    import jax.numpy as jnp

    B = batch_size
    L = windowing_cfg.max_seq_length
    if mesh is not None:
        dp = mesh.shape["data"]
        B = ((B + dp - 1) // dp) * dp
    C = chunk_batches
    chunk_windows = C * B
    vocab_size = getattr(getattr(model, "enc_cfg", None), "vocab_size", 1 << 30)
    ids_dtype = np.int16 if vocab_size < 2 ** 15 else np.int32

    run = make_scan_predict_fn(model, mesh, fetch_dtype=jnp.bfloat16,
                               gather_sents=True, mask_from_len=True,
                               tt_zero=True)

    t = {"featurize": 0.0, "dispatch": 0.0, "fetch": 0.0,
         "aggregate": 0.0, "metrics": 0.0}
    t0_total = time.perf_counter()

    # window buffer (SoA) drained in fixed-shape chunks
    buf: Dict[str, List[np.ndarray]] = {k: [] for k in
                                        ("ids", "len", "pos", "slab", "eid")}
    buffered = 0
    pending: List[tuple] = []
    n_windows = 0

    def _dispatch(chunk: Dict[str, np.ndarray], keep: int):
        nonlocal pending
        tick = time.perf_counter()
        grid = lambda a: a.reshape((C, B) + a.shape[1:])
        res = run(
            params,
            jnp.asarray(grid(chunk["ids"])),
            jnp.asarray(grid(chunk["len"])),
            jnp.asarray(grid(chunk["pos"])),
        )
        pending.append((res, chunk["eid"], chunk["slab"], keep))
        t["dispatch"] += time.perf_counter() - tick

    def _drain(final: bool = False):
        nonlocal buf, buffered
        while buffered >= chunk_windows or (final and buffered > 0):
            tick = time.perf_counter()
            cat = {k: np.concatenate(v, 0) if len(v) > 1 else v[0]
                   for k, v in buf.items()}
            take = min(chunk_windows, buffered)
            chunk = {"ids": cat["ids"][:take], "len": cat["len"][:take],
                     "pos": cat["pos"][:take], "slab": cat["slab"][:take],
                     "eid": cat["eid"][:take]}
            if take < chunk_windows:  # tail: pad by repeating the last row
                pad = chunk_windows - take
                chunk = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                         for k, v in chunk.items()}
            rest = {k: [v[take:]] for k, v in cat.items()}
            buf = rest
            buffered -= take
            t["featurize"] += time.perf_counter() - tick
            _dispatch(chunk, take)

    groups = range(0, len(docs), docs_per_group)
    for g0 in groups:
        group = docs[g0 : g0 + docs_per_group]
        tick = time.perf_counter()
        if tokenize_fn is not None:
            sents = [s for d in group for s in d["sentences"]]
            enc = tokenize_fn(sents)
            group2, i = [], 0
            for d in group:
                k = len(d["sentences"])
                group2.append({"sent_token_ids": enc[i : i + k],
                               "labels": d["labels"]})
                i += k
            group = group2
        stacked = window_documents_stacked(group, windowing_cfg,
                                           max_sentences_per_window=sent_k)
        nw = stacked["input_ids"].shape[0]
        if nw:
            if stacked["sent_mask"][:, -1].any():
                raise ValueError(
                    f"a window holds >= sent_k={sent_k} sentences; raise "
                    "sent_k (windows can hold up to max_seq_length//2+1)")
            ids = stacked["input_ids"]
            if ids_dtype == np.int16:
                ids = ids.astype(np.int16)
            buf["ids"].append(ids)
            buf["len"].append(
                stacked["attention_mask"].sum(1, dtype=np.int32))
            buf["pos"].append(stacked["sent_positions"].astype(np.int16))
            buf["slab"].append(stacked["sent_labels"])
            buf["eid"].append(stacked["example_id"] + g0)
            buffered += nw
            n_windows += nw
        t["featurize"] += time.perf_counter() - tick
        _drain()
    _drain(final=True)

    # start D2H for every chunk before the first blocking fetch
    tick = time.perf_counter()
    for res, *_ in pending:
        res.copy_to_host_async()
    agg = _Aggregator(len(docs))
    for res, eid, slab, keep in pending:
        f0 = time.perf_counter()
        logits = np.asarray(res).reshape(chunk_windows, sent_k, -1)[:keep]
        t["fetch"] += time.perf_counter() - f0
        a0 = time.perf_counter()
        agg.add_chunk(eid[:keep], slab[:keep], logits.astype(np.float32))
        t["aggregate"] += time.perf_counter() - a0
    t["fetch"] += 0.0 if pending else time.perf_counter() - tick

    per_doc = agg.per_doc(n_classes=2)
    metrics = {}
    if compute_metrics:
        from spokennlp_tpu.eval import seg_metrics

        m0 = time.perf_counter()
        kept = [(d["scores"], d["labels"].tolist())
                for d in per_doc if len(d["labels"])]
        metrics = seg_metrics.compute_example_level_metric(
            [s for s, _ in kept], [l for _, l in kept],
            threshold=threshold, topk=topk, f1_at_k=f1_at_k)
        t["metrics"] = time.perf_counter() - m0

    total = time.perf_counter() - t0_total
    timing = {**{k: round(v, 4) for k, v in t.items()},
              "total": round(total, 4), "windows": n_windows,
              "windows_per_sec": round(n_windows / total, 1) if total else 0.0}
    return {"metrics": metrics, "per_doc": per_doc, "timing": timing}
