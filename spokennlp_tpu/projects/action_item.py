"""Action-item detection: sentence classification with Context-Drop + R-Drop.

TPU-native replacement for the reference's TF1 Estimator stack (reference:
action-item-detection/script/run_classifier.py:29-1766):

- context assembly: [CLS] left ctx [SEP]... sentence [SEP] right/global ctx
  [SEP]..., focus sentence tokens carry token_type 0, context tokens 1
  (the reference pools "focus" tokens via 1 - segment_ids, :938-946).
- example pairing for the consistency objective (:420-520):
    "none"                 one example
    "r-drop"               two identical copies (dropout makes them differ)
    "context-drop-fix"     (with context, without context)
    "context-drop-dynamic" two random context subsets, keep-prob 0.5
  noisy handling when a kept context sentence is itself positive:
  skip | update | remain (:428-438).
- classifier inputs: cls | sep | token_avg | token_max (:897-970).
- loss: CE (optional label smoothing eps=0.1 / focal gamma=2) + alpha *
  mean(KL(p1||p2) + KL(p2||p1)) / 2 between the paired views (:1015-1043).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.train.train_step import fast_dropout_key

Array = jax.Array
NEG_INF = -1e4


@dataclasses.dataclass(frozen=True)
class AidConfig:
    num_labels: int = 2
    classifier_input: str = "cls"  # cls | sep | token_avg | token_max
    loss_type: str = "ce"  # ce | focal_loss
    focal_gamma: float = 2.0
    do_label_smoothing: bool = False
    label_smoothing_eps: float = 0.1
    kl_alpha: float = 1.0
    drop_type: str = "context-drop-dynamic"  # none | r-drop | context-drop-fix
    #                                          | context-drop-dynamic
    noisy_type: str = "update"  # skip | update | remain
    context_keep_prob: float = 0.5
    max_seq_length: int = 128
    dropout_rate: float = 0.1


# ------------------------------------------------------------------ pairing


def build_paired_examples(
    sentences: Sequence[Dict],
    cfg: AidConfig,
    rng: np.random.Generator,
    context_width: int = 2,
    use_global: bool = False,
) -> List[Dict]:
    """Assemble (possibly paired) classification examples from a meeting.

    ``sentences``: [{"text": str, "label": 0/1}] in order. Returns examples
    {"sentence", "contexts": [str], "context_labels": [int], "label", "pair"}
    where consecutive rows with the same ``pair`` id form a consistency pair.
    """
    out: List[Dict] = []
    pair_id = 0
    n = len(sentences)
    for i, sent in enumerate(sentences):
        left = sentences[max(0, i - context_width) : i]
        right = sentences[i + 1 : i + 1 + context_width]
        glob = []
        if use_global:
            glob = [sentences[0]] if i != 0 else []
        base_ctx = left + right + glob

        def ctx_label(ctx: Sequence[Dict]) -> int:
            return 1 if any(c["label"] == 1 for c in ctx) else 0

        def resolve(label: int, ctx: Sequence[Dict]) -> Optional[int]:
            if ctx_label(ctx) and label == 0:
                if cfg.noisy_type == "skip":
                    return None
                if cfg.noisy_type == "update":
                    return 1
            return label

        def make(ctx: Sequence[Dict], label: int) -> Dict:
            return {
                "sentence": sent["text"],
                "contexts": [c["text"] for c in ctx],
                "label": label,
                "pair": pair_id,
            }

        if cfg.drop_type == "none":
            lab = resolve(sent["label"], base_ctx)
            if lab is None:
                continue
            out.append(make(base_ctx, lab))
        elif cfg.drop_type == "r-drop":
            lab = resolve(sent["label"], base_ctx)
            if lab is None:
                continue
            out.append(make(base_ctx, lab))
            out.append(make(base_ctx, lab))
        elif cfg.drop_type == "context-drop-fix":
            lab = resolve(sent["label"], base_ctx)
            if lab is None:
                continue
            out.append(make(base_ctx, lab))
            out.append(make([], sent["label"]))
        elif cfg.drop_type == "context-drop-dynamic":
            first = [c for c in base_ctx if rng.random() < cfg.context_keep_prob]
            second = [c for c in base_ctx if rng.random() < cfg.context_keep_prob]
            lab1 = resolve(sent["label"], first)
            lab2 = resolve(sent["label"], second)
            if lab1 is None or lab2 is None:
                continue
            if cfg.noisy_type == "remain":
                lab1 = lab2 = sent["label"]
            out.append(make(first, lab1))
            out.append(make(second, lab2))
        else:
            raise ValueError(cfg.drop_type)
        pair_id += 1
    return out


def featurize_example(
    example: Dict,
    tokenize_fn,
    cfg: AidConfig,
    cls_id: int,
    sep_id: int,
    pad_id: int = 0,
) -> Dict[str, np.ndarray]:
    """[CLS] sentence [SEP] ctx1 [SEP] ctx2 [SEP] ...; sentence = type 0."""
    L = cfg.max_seq_length
    sent_tokens = list(tokenize_fn(example["sentence"]))
    ids = [cls_id] + sent_tokens + [sep_id]
    types = [0] * len(ids)
    sep_positions = [len(ids) - 1]
    for ctx in example["contexts"]:
        ctx_tokens = list(tokenize_fn(ctx))
        ids.extend(ctx_tokens + [sep_id])
        types.extend([1] * (len(ctx_tokens) + 1))
        sep_positions.append(len(ids) - 1)
    ids = ids[:L]
    types = types[:L]
    n = len(ids)
    input_ids = np.full(L, pad_id, np.int32)
    input_ids[:n] = ids
    token_type_ids = np.zeros(L, np.int32)
    token_type_ids[:n] = types
    attention_mask = np.zeros(L, np.int32)
    attention_mask[:n] = 1
    sent_sep = min(sep_positions[0], L - 1)
    return {
        "input_ids": input_ids,
        "token_type_ids": token_type_ids,
        "attention_mask": attention_mask,
        "sep_position": np.asarray(sent_sep, np.int32),
        "label": np.asarray(example["label"], np.int32),
    }


# -------------------------------------------------------------------- model


class AidModel(nn.Module):
    """Encoder + pooling-variant classifier head."""

    enc_cfg: EncoderConfig
    cfg: AidConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        token_type_ids: Array,
        sep_position: Array,
        deterministic: bool = True,
    ) -> Array:
        out = Encoder(self.enc_cfg, dtype=self.dtype, name="encoder")(
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            deterministic=deterministic,
        )
        seq = out.last_hidden_state
        c = self.cfg
        if c.classifier_input == "cls":
            pooled = out.pooled_output
        elif c.classifier_input == "sep":
            pooled = jnp.take_along_axis(seq, sep_position[:, None, None], axis=1)[:, 0]
        elif c.classifier_input in ("token_avg", "token_max"):
            # focus tokens: type 0, excluding CLS, valid
            focus = (
                (token_type_ids == 0)
                & attention_mask.astype(bool)
                & (jnp.arange(seq.shape[1])[None, :] > 0)
            )
            if c.classifier_input == "token_avg":
                maskf = focus.astype(seq.dtype)[..., None]
                pooled = (seq * maskf).sum(1) / jnp.maximum(maskf.sum(1), 1.0)
            else:
                pooled = jnp.max(
                    jnp.where(focus[..., None], seq, NEG_INF), axis=1
                )
        else:
            raise ValueError(c.classifier_input)
        pooled = nn.Dropout(c.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(c.num_labels, dtype=self.dtype, name="classifier")(pooled)


def aid_loss(logits: Array, labels: Array, cfg: AidConfig, training: bool = True):
    """CE/focal (+ smoothing) + symmetric-KL between paired rows (:1015-1043).

    Rows 2i and 2i+1 are a pair (batch must interleave pairs).
    """
    logits = logits.astype(jnp.float32)
    num_labels = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_labels)
    if cfg.do_label_smoothing:
        eps = cfg.label_smoothing_eps
        one_hot = (1 - eps) * one_hot + eps / num_labels
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    if cfg.loss_type == "focal_loss":
        per_ex = -jnp.sum(one_hot * (1 - probs) ** cfg.focal_gamma * log_probs, -1)
    else:
        per_ex = -jnp.sum(one_hot * log_probs, -1)
    loss_ce = per_ex.mean()
    aux = {"ce": loss_ce}
    if not training or cfg.drop_type == "none":
        return loss_ce, aux

    pair = logits.reshape(-1, 2, num_labels)
    p1 = jax.nn.softmax(pair[:, 0], -1)
    p2 = jax.nn.softmax(pair[:, 1], -1)
    kl12 = jnp.sum(p1 * (jnp.log(p1 + 1e-12) - jnp.log(p2 + 1e-12)), -1)
    kl21 = jnp.sum(p2 * (jnp.log(p2 + 1e-12) - jnp.log(p1 + 1e-12)), -1)
    loss_kl = jnp.mean(kl12 + kl21) / 2.0
    aux["kl"] = loss_kl
    return loss_ce + cfg.kl_alpha * loss_kl, aux


def make_aid_train_step(model: "AidModel", cfg: AidConfig, tx):
    """Jitted train step; batch rows must interleave consistency pairs."""
    import optax
    from spokennlp_tpu.train.train_step import TrainState

    def loss_fn(params, batch, rng):
        logits = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            batch["token_type_ids"],
            batch["sep_position"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        return aid_loss(logits, batch["label"], cfg, training=True)

    def step(state, batch, rng):
        rng = fast_dropout_key(jax.random.fold_in(rng, state.step))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss, **aux},
        )

    return jax.jit(step, donate_argnums=(0,))


def collate_examples(
    examples: Sequence[Dict], tokenize_fn, cfg: AidConfig, cls_id: int, sep_id: int
) -> Dict[str, np.ndarray]:
    feats = [featurize_example(e, tokenize_fn, cfg, cls_id, sep_id) for e in examples]
    return {k: np.stack([f[k] for f in feats]) for k in feats[0]}
