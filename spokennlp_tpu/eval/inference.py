"""Windowed inference engine: batched jit forward over document windows.

The reference's north-star path (reference: emnlp2023-topic_segmentation/src/
ts_sentence_seq_labeling.py:1119-1224 — trainer.predict over the windowed
dataset, then host-side example re-aggregation). Here the engine is an
XLA-compiled fixed-shape loop:

  host featurize -> pad to batch grid -> jit(encode+classify) per batch ->
  host gather at labeled positions -> per-document metric evaluation.

TPU notes: one compiled program (fixed B, L) serves the whole corpus; the tail
batch is padded with dead windows and masked out on host. Inputs stream via
device_put while the previous batch computes (XLA's async dispatch overlaps
H2D with compute without explicit double buffering).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.data import windowing as W


def make_predict_fn(model, params, donate: bool = False):
    """Build the jitted window-scoring function: batch -> token logits."""

    @functools.partial(jax.jit)
    def predict(input_ids, attention_mask, token_type_ids):
        out = model.apply(
            {"params": params},
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            deterministic=True,
        )
        return out["token_logits"].astype(jnp.float32)

    return predict


def predict_windows(
    predict_fn,
    batch: Dict[str, np.ndarray],
    batch_size: int,
) -> np.ndarray:
    """Score every window with a fixed-shape compiled program.

    Args:
      predict_fn: jitted (input_ids, attention_mask, token_type_ids) -> logits.
      batch: stacked window arrays (from data.windowing.stack_windows).
      batch_size: device batch; the tail is padded with repeated windows.

    Returns:
      (N, L, C) float32 logits for the N real windows.
    """
    n = batch["input_ids"].shape[0]
    outs: List[np.ndarray] = []
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        sl = slice(start, end)
        ids = batch["input_ids"][sl]
        am = batch["attention_mask"][sl]
        tt = batch["token_type_ids"][sl]
        pad = batch_size - (end - start)
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
            am = np.concatenate([am, np.repeat(am[-1:], pad, 0)])
            tt = np.concatenate([tt, np.repeat(tt[-1:], pad, 0)])
        logits = predict_fn(jnp.asarray(ids), jnp.asarray(am), jnp.asarray(tt))
        outs.append(np.asarray(logits[: end - start]))
    return np.concatenate(outs, axis=0)


def run_topic_seg_inference(
    model,
    params,
    docs: Sequence[Dict],
    windowing_cfg,
    batch_size: int = 32,
    threshold: Optional[float] = None,
    topk: Optional[int] = None,
    f1_at_k: Optional[int] = None,
) -> Dict:
    """Full predict pipeline for a corpus of tokenized documents.

    Args:
      docs: each {"sent_token_ids": [[int]], "labels": [int]}.

    Returns:
      {"metrics": {...}, "per_doc": [{"labels", "scores"}]}.
    """
    from spokennlp_tpu.eval import seg_metrics

    windows = []
    for eid, doc in enumerate(docs):
        windows.extend(
            W.window_document(
                doc["sent_token_ids"], doc["labels"], windowing_cfg, example_id=eid
            )
        )
    batch = W.stack_windows(windows)
    predict_fn = make_predict_fn(model, params)
    logits = predict_windows(predict_fn, batch, batch_size)
    per_doc = W.aggregate_window_predictions(
        batch["example_id"], batch["labels"], logits, num_examples=len(docs)
    )
    kept = [(d["scores"], d["labels"].tolist()) for d in per_doc if len(d["labels"])]
    metrics = seg_metrics.compute_example_level_metric(
        [s for s, _ in kept],
        [l for _, l in kept],
        threshold=threshold,
        topk=topk,
        f1_at_k=f1_at_k,
    )
    return {"metrics": metrics, "per_doc": per_doc}
