"""Masked-LM + NSP further-pretraining objective (AID recipe counterpart).

The reference's action-item project ships Google's BERT pretraining tooling
(reference: action-item-detection/script/create_pretraining_data.py:342-415
masking walk; run_pretraining.py:127-148 MLM+NSP losses) for further
pretraining on meeting text. This module reimplements that capability
TPU-natively: host-side pure-function data building (numpy rng) + a jitted
MLM/NSP loss over the shared Encoder trunk.

Semantics preserved:
  - 15% of tokens selected (cap ``max_predictions_per_seq``, min 1), special
    tokens excluded; optional whole-word masking via subword flags.
  - 80% -> [MASK], 10% -> unchanged, 10% -> random vocab token
    (create_pretraining_data.py:391-401).
  - MLM head: Dense(H) + gelu + LayerNorm, logits against the TIED word
    embedding + output bias (run_pretraining.py get_masked_lm_output).
  - NSP head: 2-way classifier on the pooled [CLS] (get_next_sentence_output).
  - total = mlm_loss + nsp_loss (run_pretraining.py:148).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import ACT2FN, Encoder

Array = jax.Array
IGNORE = -100


# ------------------------------------------------------------------ host side


def create_masked_lm_predictions(
    token_ids: Sequence[int],
    special_ids: Sequence[int],
    vocab_size: int,
    rng: np.random.Generator,
    mask_token_id: int,
    masked_lm_prob: float = 0.15,
    max_predictions_per_seq: int = 20,
    subword_flags: Optional[Sequence[bool]] = None,
):
    """Reference masking walk (create_pretraining_data.py:342-415).

    ``subword_flags[i]`` True marks a ##-continuation piece (whole-word
    masking groups it with its predecessor); None = per-token masking.
    Returns (masked_ids, positions, labels) with positions sorted ascending.
    """
    specials = set(int(s) for s in special_ids)
    cand_indexes: List[List[int]] = []
    for i, t in enumerate(token_ids):
        if int(t) in specials:
            continue
        if subword_flags is not None and subword_flags[i] and cand_indexes:
            cand_indexes[-1].append(i)
        else:
            cand_indexes.append([i])

    order = rng.permutation(len(cand_indexes))
    num_to_predict = min(
        max_predictions_per_seq, max(1, int(round(len(token_ids) * masked_lm_prob)))
    )
    out = list(int(t) for t in token_ids)
    picked: List[int] = []
    covered = set()
    for oi in order:
        index_set = cand_indexes[oi]
        if len(picked) >= num_to_predict:
            break
        if len(picked) + len(index_set) > num_to_predict:
            continue
        if any(i in covered for i in index_set):
            continue
        for i in index_set:
            covered.add(i)
            r = rng.random()
            if r < 0.8:
                out[i] = mask_token_id
            elif rng.random() < 0.5:
                pass  # keep original
            else:
                out[i] = int(rng.integers(0, vocab_size))
            picked.append(i)
    picked.sort()
    labels = [int(token_ids[i]) for i in picked]
    return out, picked, labels


def build_pretraining_batch(
    docs: Sequence[Sequence[Sequence[int]]],
    cfg,
    rng: np.random.Generator,
    max_seq_length: int = 128,
    max_predictions_per_seq: int = 20,
    masked_lm_prob: float = 0.15,
    vocab_size: int = 30522,
):
    """Documents (lists of per-sentence token-id lists) -> MLM+NSP examples.

    Pairs consecutive sentences as [CLS] A [SEP] B [SEP]; with p=0.5 B is a
    random sentence from another document (next_sentence_label 1, the
    reference's is_random_next). Returns stacked np arrays.
    """
    ex = {k: [] for k in (
        "input_ids", "attention_mask", "token_type_ids",
        "mlm_positions", "mlm_labels", "mlm_weights", "nsp_labels",
    )}
    all_sents = [s for d in docs for s in d if len(s) > 0]
    L, P = max_seq_length, max_predictions_per_seq
    for doc in docs:
        for si in range(len(doc) - 1):
            a = list(doc[si])
            if rng.random() < 0.5 and len(all_sents) > 1:
                b = list(all_sents[int(rng.integers(0, len(all_sents)))])
                nsp = 1
            else:
                b = list(doc[si + 1])
                nsp = 0
            # truncate longest-first to fit [CLS] a [SEP] b [SEP]
            while len(a) + len(b) > L - 3:
                (a if len(a) >= len(b) else b).pop()
            ids = [cfg.cls_token_id] + a + [cfg.sep_token_id] + b + [cfg.sep_token_id]
            tt = [0] * (len(a) + 2) + [1] * (len(b) + 1)
            specials = (cfg.cls_token_id, cfg.sep_token_id, cfg.pad_token_id)
            masked, pos, labels = create_masked_lm_predictions(
                ids, specials, vocab_size, rng, cfg.mask_token_id,
                masked_lm_prob, P,
            )
            n = len(ids)
            row = np.full(L, cfg.pad_token_id, np.int32)
            row[:n] = masked
            am = np.zeros(L, np.int32)
            am[:n] = 1
            ttr = np.zeros(L, np.int32)
            ttr[:n] = tt
            pr = np.zeros(P, np.int32)
            lr = np.zeros(P, np.int32)
            wr = np.zeros(P, np.float32)
            k = min(len(pos), P)
            pr[:k], lr[:k], wr[:k] = pos[:k], labels[:k], 1.0
            ex["input_ids"].append(row)
            ex["attention_mask"].append(am)
            ex["token_type_ids"].append(ttr)
            ex["mlm_positions"].append(pr)
            ex["mlm_labels"].append(lr)
            ex["mlm_weights"].append(wr)
            ex["nsp_labels"].append(nsp)
    return {k: np.stack(v) if k != "nsp_labels" else np.asarray(v, np.int32)
            for k, v in ex.items()}


@dataclasses.dataclass(frozen=True)
class PretrainDataConfig:
    cls_token_id: int = 101
    sep_token_id: int = 102
    pad_token_id: int = 0
    mask_token_id: int = 103


# ---------------------------------------------------------------- device side


class BertForPreTraining(nn.Module):
    """Encoder trunk + MLM head (tied embeddings) + NSP head."""

    enc_cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        token_type_ids: Array,
        mlm_positions: Array,  # (B, P)
        deterministic: bool = True,
    ) -> Dict[str, Array]:
        cfg = self.enc_cfg
        enc = Encoder(cfg, dtype=self.dtype, name="encoder")(
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            deterministic=deterministic,
        )
        seq = enc.last_hidden_state  # (B, L, H)
        gathered = jnp.take_along_axis(
            seq, mlm_positions[..., None], axis=1
        )  # (B, P, H)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlm_transform")(
            gathered
        )
        h = ACT2FN[cfg.hidden_act](h)
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mlm_ln"
        )(h)
        # tied word embeddings (get_masked_lm_output's output_weights)
        emb = self.variables["params"]["encoder"]["embeddings"][
            "word_embeddings"
        ]["embedding"]
        bias = self.param(
            "mlm_output_bias", nn.initializers.zeros, (cfg.vocab_size,)
        )
        mlm_logits = (
            jnp.einsum("bph,vh->bpv", h.astype(jnp.float32), emb.astype(jnp.float32))
            + bias
        )
        pooled = enc.pooled_output
        if pooled is None:  # trunk configured without pooler: CLS + tanh
            pooled = nn.tanh(
                nn.Dense(cfg.hidden_size, dtype=self.dtype, name="nsp_pool")(
                    seq[:, 0]
                )
            )
        nsp_logits = nn.Dense(2, dtype=jnp.float32, name="nsp_classifier")(
            pooled.astype(jnp.float32)
        )
        return {"mlm_logits": mlm_logits, "nsp_logits": nsp_logits}


def pretraining_loss(outputs: Dict[str, Array], batch: Dict[str, Array]):
    """total = weighted-mean MLM CE + mean NSP CE (run_pretraining.py:148)."""
    mlm_logp = jax.nn.log_softmax(outputs["mlm_logits"], -1)
    lm = -jnp.take_along_axis(mlm_logp, batch["mlm_labels"][..., None], -1)[..., 0]
    w = batch["mlm_weights"]
    mlm_loss = jnp.sum(lm * w) / jnp.maximum(jnp.sum(w), 1e-5)
    nsp_logp = jax.nn.log_softmax(outputs["nsp_logits"], -1)
    nsp_loss = -jnp.take_along_axis(
        nsp_logp, batch["nsp_labels"][:, None], -1
    ).mean()
    return mlm_loss + nsp_loss, {"mlm_loss": mlm_loss, "nsp_loss": nsp_loss}
