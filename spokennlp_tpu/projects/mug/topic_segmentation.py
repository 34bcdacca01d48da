"""MUG Track 1: PoNet topic segmentation over EOS-marked meeting windows.

Reimplements the reference pipeline (reference: alimeeting4mug/src/
topic_segment/ponet_topic_segmentation.py): every sentence is suffixed with
an [EOS] marker carrying its label; documents are chunked with the same
shared-sentence sliding-window rule as emnlp2023 (window loop :617-680); each
token carries a per-sentence ``segment_ids`` value for PoNet's segment
max-pooling (:564-596; CLS -> 0, pads -> n_sentences + 1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from spokennlp_tpu.configs import WindowingConfig
from spokennlp_tpu.train.train_step import fast_dropout_key

IGNORE = -100


@dataclasses.dataclass
class EosWindow:
    example_id: int
    input_ids: np.ndarray  # (L,)
    attention_mask: np.ndarray
    token_type_ids: np.ndarray
    segment_ids: np.ndarray  # (L,) per-token sentence id
    labels: np.ndarray  # (L,) label at EOS positions else IGNORE
    sent_ids: List[int]  # document sentence indices labeled in this window


def window_document_eos(
    sent_token_ids: Sequence[Sequence[int]],
    sent_labels: Sequence[int],
    cfg: WindowingConfig,
    eos_token_id: int,
    example_id: int = 0,
    paragraph_ids: Optional[Sequence[int]] = None,
) -> List[EosWindow]:
    """Chunk an EOS-marked document into overlapping fixed windows.

    ``paragraph_ids``: optional per-sentence paragraph index — when given,
    segment_ids use paragraph granularity (use_paragraph_segment mode,
    reference :588-591); otherwise sentence granularity.
    """
    n_sent = len(sent_token_ids)
    if n_sent == 0:
        return []
    L = cfg.max_seq_length

    flat: List[int] = []
    tok_sent: List[int] = []  # sentence index (0-based) per token
    eos_pos: List[int] = []
    for si, sent in enumerate(sent_token_ids):
        flat.extend(int(t) for t in sent)
        tok_sent.extend([si] * len(sent))
        eos_pos.append(len(flat))
        flat.append(eos_token_id)
        tok_sent.append(si)
    total = len(flat)

    seg_value = (
        (lambda si: int(paragraph_ids[si]))
        if paragraph_ids is not None
        else (lambda si: si + 1)
    )

    windows: List[EosWindow] = []
    token_left = 0
    sent_left = 0
    sent_i = 0
    while sent_i < n_sent:
        token_right = eos_pos[sent_i] + 1
        if (token_right - token_left) >= L - 1 or token_right == total:
            single = sent_i == sent_left
            ids = [cfg.cls_token_id] + flat[token_left:token_right]
            ids = ids[:L]
            n = len(ids)
            segs = [0] + [seg_value(tok_sent[p]) for p in range(token_left, token_right)]
            segs = segs[:L]
            labels = np.full(L, IGNORE, np.int32)
            sent_ids: List[int] = []
            for si in range(sent_left, sent_i + 1):
                pos = eos_pos[si] - token_left + 1
                if pos >= L:
                    break
                if si != sent_i:  # last sentence of the window is masked
                    labels[pos] = sent_labels[si]
                    if sent_labels[si] != IGNORE:
                        sent_ids.append(si)
            if single and n == L:
                ids[-1] = eos_token_id  # truncated single sentence keeps an EOS
            input_ids = np.full(L, cfg.pad_token_id, np.int32)
            input_ids[:n] = np.asarray(ids, np.int32)
            attention_mask = np.zeros(L, np.int32)
            attention_mask[:n] = 1
            segment_ids = np.full(L, n_sent + 1, np.int32)
            segment_ids[:n] = np.asarray(segs[:n], np.int32)
            windows.append(
                EosWindow(
                    example_id=example_id,
                    input_ids=input_ids,
                    attention_mask=attention_mask,
                    token_type_ids=np.zeros(L, np.int32),
                    segment_ids=segment_ids,
                    labels=labels,
                    sent_ids=sent_ids,
                )
            )
            if single:
                token_left = token_right
                sent_left = sent_i + 1
                sent_i += 1
            elif token_right == total:
                sent_left = sent_i + 1
                sent_i += 1
                token_left = token_right
            else:
                token_left = eos_pos[sent_i - 1] + 1
                sent_left = sent_i
        else:
            sent_i += 1
    return windows


def stack_eos_windows(windows: Sequence[EosWindow]) -> Dict[str, np.ndarray]:
    out = {
        f: np.stack([getattr(w, f) for w in windows])
        for f in ("input_ids", "attention_mask", "token_type_ids", "segment_ids", "labels")
    }
    out["example_id"] = np.asarray([w.example_id for w in windows], np.int32)
    return out


def make_ponet_train_step(model, tx):
    """Jitted train step for PoNet token classification (masked CE on the
    labeled EOS positions; reference: modeling_ponet.py:85-97)."""
    import jax
    import optax

    from spokennlp_tpu.ops.losses import cross_entropy_with_ignore
    from spokennlp_tpu.train.train_step import TrainState

    def loss_fn(params, batch, rng):
        out = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            segment_ids=batch["segment_ids"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        return cross_entropy_with_ignore(out["token_logits"], batch["labels"])

    def step(state, batch, rng):
        rng = fast_dropout_key(jax.random.fold_in(rng, state.step))
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss},
        )

    return jax.jit(step, donate_argnums=(0,))


def predict_boundaries(
    model,
    params,
    meetings: Sequence[Dict],
    tokenize_fn,
    cfg: WindowingConfig,
    eos_token_id: int,
    batch_size: int = 8,
    threshold: Optional[float] = None,
) -> List[List[int]]:
    """Predict 1-based boundary sentence ids per meeting (for submissions)."""
    import jax
    import jax.numpy as jnp

    all_windows: List[EosWindow] = []
    for eid, m in enumerate(meetings):
        sent_tokens = [tokenize_fn(s) for s in m["sentences"]]
        all_windows.extend(
            window_document_eos(
                sent_tokens, m["labels"], cfg, eos_token_id, example_id=eid
            )
        )
    batch = stack_eos_windows(all_windows)

    @jax.jit
    def fwd(ids, am, seg):
        out = model.apply(
            {"params": params}, ids, attention_mask=am, segment_ids=seg,
            deterministic=True,
        )
        return out["token_logits"].astype(jnp.float32)

    N = batch["input_ids"].shape[0]
    logits_all = []
    for s in range(0, N, batch_size):
        e = min(s + batch_size, N)
        ids = batch["input_ids"][s:e]
        am = batch["attention_mask"][s:e]
        sg = batch["segment_ids"][s:e]
        pad = batch_size - (e - s)
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
            am = np.concatenate([am, np.repeat(am[-1:], pad, 0)])
            sg = np.concatenate([sg, np.repeat(sg[-1:], pad, 0)])
        lg = fwd(jnp.asarray(ids), jnp.asarray(am), jnp.asarray(sg))
        logits_all.append(np.asarray(lg)[: e - s])
    logits_all = np.concatenate(logits_all, 0)

    boundaries: List[List[int]] = [[] for _ in meetings]
    wi = 0
    for w in all_windows:
        live = w.labels != IGNORE
        win_logits = logits_all[wi][live]
        if threshold is not None:
            p = np.exp(win_logits - win_logits.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            preds = (p[:, 0] >= threshold).astype(np.int32)
        else:
            preds = (np.argmax(win_logits, -1) == 0).astype(np.int32)
        for sid, pred in zip(w.sent_ids, preds):
            if pred:
                boundaries[w.example_id].append(sid + 1)  # 1-based
        wi += 1
    return [sorted(set(b)) for b in boundaries]
