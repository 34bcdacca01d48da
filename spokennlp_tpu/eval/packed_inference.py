"""Packed windowed inference: multiple short windows per 512-token sequence.

Real corpora produce windows that are mostly padding (the featurizer cuts at
sentence boundaries, so a "512-token window" averages well under 512 real
tokens). The reference pads every window to max_seq_length and pays dense
encoder cost for the padding (HF Trainer predict path). Here windows are
greedily bin-packed into full sequences; block-diagonal attention via
pack_segment_ids (einsum-bias or Pallas path) keeps windows independent, and
per-window position ids restart so absolute-position embeddings match the
unpacked computation exactly.

Throughput scales with ~1/fill_ratio — the single biggest win over the
reference's inference path on identical hardware.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.data.windowing import IGNORE, Window


@dataclasses.dataclass
class PackedBatchItem:
    """One packed sequence: which windows it holds and where."""

    window_indices: List[int]
    offsets: List[int]
    lengths: List[int]


def pack_windows(
    real_lengths: Sequence[int], max_seq_length: int
) -> List[PackedBatchItem]:
    """First-fit-decreasing bin packing of window content lengths."""
    order = np.argsort(-np.asarray(real_lengths), kind="stable")
    bins: List[PackedBatchItem] = []
    bin_free: List[int] = []
    for wi in order:
        n = int(real_lengths[wi])
        placed = False
        for b, free in enumerate(bin_free):
            if free >= n:
                item = bins[b]
                item.offsets.append(max_seq_length - free)
                item.window_indices.append(int(wi))
                item.lengths.append(n)
                bin_free[b] -= n
                placed = True
                break
        if not placed:
            bins.append(
                PackedBatchItem(window_indices=[int(wi)], offsets=[0], lengths=[n])
            )
            bin_free.append(max_seq_length - n)
    return bins


def build_packed_batch(
    windows: Sequence[Window], max_seq_length: int
) -> Tuple[Dict[str, np.ndarray], List[PackedBatchItem]]:
    """Pack featurized windows into dense sequences.

    Returns arrays: input_ids, pack_segment_ids (0 pad, i+1 = slot),
    position_ids (restart per window), plus the packing plan for unpacking
    logits.
    """
    real_lengths = [int(w.attention_mask.sum()) for w in windows]
    plan = pack_windows(real_lengths, max_seq_length)
    P = len(plan)
    L = max_seq_length
    input_ids = np.zeros((P, L), np.int32)
    seg = np.zeros((P, L), np.int32)
    pos = np.zeros((P, L), np.int32)
    for p, item in enumerate(plan):
        for slot, (wi, off, n) in enumerate(
            zip(item.window_indices, item.offsets, item.lengths)
        ):
            w = windows[wi]
            input_ids[p, off : off + n] = w.input_ids[:n]
            seg[p, off : off + n] = slot + 1
            pos[p, off : off + n] = np.arange(n)
    batch = {
        "input_ids": input_ids,
        "pack_segment_ids": seg,
        "position_ids": pos,
        "attention_mask": (seg > 0).astype(np.int32),
    }
    return batch, plan


def make_packed_predict_fn(model, params):
    @jax.jit
    def predict(input_ids, attention_mask, pack_segment_ids, position_ids):
        out = model.apply(
            {"params": params},
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=jnp.zeros_like(input_ids),
            position_ids=position_ids,
            pack_segment_ids=pack_segment_ids,
            deterministic=True,
        )
        return out["token_logits"].astype(jnp.float32)

    return predict


def predict_windows_packed(
    model,
    params,
    windows: Sequence[Window],
    max_seq_length: int,
    batch_size: int = 32,
) -> np.ndarray:
    """Score windows via packing; returns (N, L, C) logits aligned to the
    ORIGINAL (unpacked) window layout, IGNORE-padded past each real length."""
    batch, plan = build_packed_batch(windows, max_seq_length)
    predict = make_packed_predict_fn(model, params)
    P = batch["input_ids"].shape[0]
    logits_packed = []
    for s in range(0, P, batch_size):
        e = min(s + batch_size, P)
        pad = batch_size - (e - s)
        args = []
        for key in ("input_ids", "attention_mask", "pack_segment_ids", "position_ids"):
            a = batch[key][s:e]
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, 0)])
            args.append(jnp.asarray(a))
        lg = predict(*args)
        logits_packed.append(np.asarray(lg)[: e - s])
    logits_packed = np.concatenate(logits_packed, 0)

    C = logits_packed.shape[-1]
    N = len(windows)
    out = np.zeros((N, max_seq_length, C), np.float32)
    for p, item in enumerate(plan):
        for wi, off, n in zip(item.window_indices, item.offsets, item.lengths):
            out[wi, :n] = logits_packed[p, off : off + n]
    return out
