"""Coherence-enhanced topic-segmentation model + composite objective.

TPU-native counterpart of the reference's
``{Bert,Longformer,BigBird,Electra}WithDAForSentenceLabelingTopicSegmentation``
wrappers (reference: emnlp2023-topic_segmentation/src/models/bert_for_ts.py:
19-113, longformer_for_ts.py:19-120) and its ``LossCalculator``
(src/models/modules/loss_calculator.py:11-73). One model class serves every
backbone via ``EncoderConfig.attention_type``.

Composite objective (loss_calculator.py:25-73):
    total = ts_w * CE(anchor token logits)            [ts_score_predictor=lt]
          + cl_w * CSSL(anchor eop features)          [anchor view only]
          + ts_w * CE(DA token logits)                [when DA view runs]
          + tssp_w * CE(DA sentence-pair logits)      [DA view only]
(The reference multiplies the TSSP weight twice — tssp.py:36 and
loss_calculator.py:71; we apply it once. The published recipe uses 1.0 where
the two coincide.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.objectives import cssl as cssl_ops
from spokennlp_tpu.ops import losses as loss_ops

Array = jax.Array
IGNORE = -100


class TopicSegModel(nn.Module):
    """Encoder trunk + token-classification head + TSSP head."""

    enc_cfg: EncoderConfig
    task_cfg: TopicSegConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.enc_cfg, dtype=self.dtype, name="encoder")
        self.head_dropout = nn.Dropout(self.task_cfg.classifier_dropout)
        self.classifier = nn.Dense(self.task_cfg.num_labels, dtype=self.dtype, name="classifier")
        self.tssp_classifier = nn.Dense(
            self.task_cfg.num_tssp_labels, dtype=self.dtype, name="tssp_classifier"
        )

    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        token_type_ids: Optional[Array] = None,
        sent_positions: Optional[Array] = None,
        global_attention_mask: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        pack_segment_ids: Optional[Array] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
    ) -> Dict[str, Array]:
        prefix_globals = None
        if self.enc_cfg.attention_type == "bigbird":
            # suffix-padding promise (the featurizer right-pads): enables the
            # fused BigBird kernel; globals are structural (first blocks)
            prefix_globals = 0
        if global_attention_mask is None and self.enc_cfg.attention_type == "sliding_window":
            # Longformer convention: CLS is global (longformer_for_ts.py:55-58).
            # CLS-only + the right-padding featurizer satisfy the fused
            # sliding kernel's prefix-globals/suffix-padding contract.
            global_attention_mask = jnp.zeros_like(attention_mask).at[:, 0].set(1)
            prefix_globals = 1
        out = self.encoder(
            input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            global_attention_mask=global_attention_mask,
            position_ids=position_ids,
            pack_segment_ids=pack_segment_ids,
            deterministic=deterministic,
            prefix_globals=prefix_globals,
            output_hidden_states=output_hidden_states,
        )
        seq = self.head_dropout(out.last_hidden_state, deterministic=deterministic)
        token_logits = self.classifier(seq)
        result = {"seq_output": seq, "token_logits": token_logits}
        if output_hidden_states:
            # per-layer (B, L, H) incl. embeddings — feeds the feature dumper
            # (reference: extract_features.py) and intermediate-layer
            # distillation (scripts/distill.py)
            result["hidden_states"] = out.hidden_states
        if sent_positions is not None:
            sent_feats = cssl_ops.gather_sentence_features(seq, sent_positions)
            result["sent_features"] = sent_feats
            result["tssp_logits"] = self.tssp_classifier(sent_feats)
        return result


def _view(batch: Dict[str, Array], key: str, view: int) -> Array:
    """Select anchor (0) or DA (1) view from a (B, 2, ...) batch tensor."""
    return batch[key][:, view]


def ts_view_loss(
    task_cfg: TopicSegConfig,
    outputs: Dict[str, Array],
    labels: Array,
    eop_positions: Array,
    eop_mask: Array,
):
    """The ts (boundary) loss of one view + its logits for prediction.

    Returns (ts_loss, logits, eop_pair_cos_sim).
    """
    eop_feats = cssl_ops.gather_sentence_features(outputs["seq_output"], eop_positions)
    eop_labels = jnp.take_along_axis(labels, eop_positions, axis=1)
    sims, sim_labels = cssl_ops.eop_pair_cosine_similarity(
        eop_feats, eop_labels, eop_mask, task_cfg.ts_score_predictor_cos_temp
    )
    if task_cfg.ts_score_predictor == "lt":
        logits = outputs["token_logits"]
        ts = loss_ops.cross_entropy_with_ignore(
            logits,
            labels,
            class_weights=loss_ops.ts_class_weights(task_cfg.weight_label_zero),
            focal_gamma=task_cfg.focal_loss_gamma,
        )
    elif task_cfg.ts_score_predictor == "cos":
        # BCE on adjacent-eop cosine: label 1 (O, same topic) -> similar
        ts = loss_ops.bce_with_logits_ignore(sims, sim_labels)
        logits = jax.nn.sigmoid(sims)
    else:
        raise ValueError(f"unsupported ts_score_predictor {task_cfg.ts_score_predictor}")
    return ts, logits, sims


def compute_topic_seg_loss(
    task_cfg: TopicSegConfig,
    anchor_out: Dict[str, Array],
    da_out: Optional[Dict[str, Array]],
    batch: Dict[str, Array],
    cssl_indices: Optional[Dict[str, Array]] = None,
):
    """Assemble the composite training loss. Returns (loss, aux_dict)."""
    aux: Dict[str, Array] = {}

    anchor_labels = _view(batch, "labels", 0)
    anchor_eop_pos = _view(batch, "sent_positions", 0)
    anchor_eop_mask = _view(batch, "eop_mask", 0)

    ts_loss, anchor_logits, _ = ts_view_loss(
        task_cfg, anchor_out, anchor_labels, anchor_eop_pos, anchor_eop_mask
    )
    loss = task_cfg.ts_loss_weight * ts_loss
    aux["ts_loss"] = ts_loss
    aux["anchor_logits"] = anchor_logits

    if task_cfg.cl_loss_weight != 0.0:
        eop_feats = cssl_ops.gather_sentence_features(
            anchor_out["seq_output"], anchor_eop_pos
        )
        eop_labels = jnp.take_along_axis(anchor_labels, anchor_eop_pos, axis=1)
        if task_cfg.cl_anchor_level == "eop_matrix":
            cl = cssl_ops.eop_matrix_cl_loss(
                eop_feats, eop_labels, anchor_eop_mask, task_cfg.cl_temp
            )
        elif task_cfg.cl_anchor_level in ("eop_list", "eot_list"):
            assert cssl_indices is not None, "list-mode CSSL needs host-side indices"
            cl = cssl_ops.list_cl_loss(
                eop_feats,
                cssl_indices["anchor_indices"],
                cssl_indices["positive_indices"],
                cssl_indices["negative_indices"],
                cssl_indices["anchor_valid"],
                task_cfg.cl_temp,
            )
        else:
            raise ValueError(f"unsupported cl_anchor_level {task_cfg.cl_anchor_level}")
        loss = loss + task_cfg.cl_loss_weight * cl
        aux["cl_loss"] = cl

    if da_out is not None:
        da_labels = _view(batch, "labels", 1)
        da_ts_loss, da_logits, _ = ts_view_loss(
            task_cfg,
            da_out,
            da_labels,
            _view(batch, "sent_positions", 1),
            _view(batch, "eop_mask", 1),
        )
        loss = loss + task_cfg.ts_loss_weight * da_ts_loss
        aux["da_ts_loss"] = da_ts_loss
        aux["da_logits"] = da_logits

        if task_cfg.tssp_loss_weight != 0.0 and task_cfg.do_tssp:
            pair_orders = _view(batch, "pair_orders", 1)
            sent_mask = _view(batch, "sent_mask", 1)
            tssp_labels = jnp.where(sent_mask.astype(bool), pair_orders, IGNORE)
            tssp = loss_ops.cross_entropy_with_ignore(da_out["tssp_logits"], tssp_labels)
            loss = loss + task_cfg.tssp_loss_weight * tssp
            aux["tssp_loss"] = tssp

    aux["loss"] = loss
    return loss, aux
