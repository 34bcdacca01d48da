"""MMVTS project glue: text-encoder + multimodal fusion end to end.

Mirrors the reference driver (reference: mmvts/src/main_multimodal.py:90-705):
clip transcripts are windowed exactly like emnlp2023 sentences (BOS-marked,
shared-sentence overlap); the text encoder produces clip features at BOS
positions; cached per-clip vis/audio features are zero-padded onto the same
(B, K) grid (reference loads .npy caches at :465-506); the fusion model +
composite loss run over the clip grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig, WindowingConfig
from spokennlp_tpu.data import windowing as W
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.models.multimodal import MultiModalForTS, MultimodalConfig
from spokennlp_tpu.objectives import mmvts_losses
from spokennlp_tpu.objectives.cssl import gather_sentence_features
from spokennlp_tpu.train.train_step import fast_dropout_key

Array = jax.Array
IGNORE = -100


class MMVTSModel(nn.Module):
    """Text trunk + clip gathering + multimodal fusion."""

    enc_cfg: EncoderConfig
    mm_cfg: MultimodalConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        clip_positions: Array,  # (B, K) BOS position of each clip in the window
        clip_mask: Array,  # (B, K)
        vis_feats: Optional[Array] = None,  # (B, K, Hv)
        audio_feats: Optional[Array] = None,  # (B, K, Ha)
        deterministic: bool = True,
    ):
        text_feats = None
        if "text" in self.mm_cfg.modalities:
            gmask, prefix = None, None
            if self.enc_cfg.attention_type == "sliding_window":
                # reference parity: text_encoder.py passes no global tokens
                # (HF Longformer default); an explicit all-zeros mask + the
                # prefix promise still enable the fused sliding kernel
                gmask = jnp.zeros_like(attention_mask)
                prefix = 0
            out = Encoder(self.enc_cfg, dtype=self.dtype, name="text_encoder")(
                input_ids,
                attention_mask=attention_mask,
                global_attention_mask=gmask,
                deterministic=deterministic,
                prefix_globals=prefix,
            )
            text_feats = gather_sentence_features(out.last_hidden_state, clip_positions)
        fusion = MultiModalForTS(self.mm_cfg, dtype=self.dtype, name="fusion")(
            clip_mask,
            text_feats=text_feats,
            vis_feats=vis_feats,
            audio_feats=audio_feats,
            deterministic=deterministic,
        )
        return fusion


def featurize_video(
    clip_token_ids: Sequence[Sequence[int]],
    clip_labels: Sequence[int],
    clip_features: Dict[str, np.ndarray],  # e.g. {"vis": (n_clips, Hv), ...}
    wcfg: WindowingConfig,
    example_id: int = 0,
    max_clips_per_window: int = 128,
):
    """Window a video's clip transcripts and align cached clip features.

    MMVTS label convention: 1 = end of topic. The windower works in the
    B-EOP=0 space, so labels are inverted on the way in and the window's
    ``sent_labels``/eop grid comes back out in MMVTS space.
    """
    inv = [0 if l == 1 else 1 for l in clip_labels]  # to B-EOP=0 space
    windows = W.window_document(
        clip_token_ids,
        inv,
        wcfg,
        example_id=example_id,
        max_sentences_per_window=max_clips_per_window,
    )
    out = []
    for w in windows:
        K = max_clips_per_window
        clip_positions = w.sent_positions
        clip_mask = w.sent_mask
        # labels back to MMVTS space (1 = end of topic); masked slots IGNORE
        lab = np.where(
            (w.sent_labels != IGNORE), 1 - np.maximum(w.sent_labels, 0), IGNORE
        ).astype(np.int32)
        feats = {}
        for name, arr in clip_features.items():
            f = np.zeros((K, arr.shape[-1]), arr.dtype)
            for k in range(K):
                if clip_mask[k] and 0 <= w.sent_ids[k] < len(arr):
                    f[k] = arr[w.sent_ids[k]]
            feats[name] = f
        out.append(
            {
                "example_id": w.example_id,
                "input_ids": w.input_ids,
                "attention_mask": w.attention_mask,
                "clip_positions": clip_positions,
                "clip_mask": clip_mask,
                "clip_labels": lab,
                "clip_ids": w.sent_ids,
                **{f"{k}_feats": v for k, v in feats.items()},
            }
        )
    return out


def make_mmvts_pretrain_step(model: MMVTSModel, tx, align_pairs=None, cl_temp=0.1):
    """Modality-alignment pretraining (reference: mmvts/src/pretrain.py):
    only the cross-modal InfoNCE objective, no segmentation loss."""
    return make_mmvts_train_step(
        model,
        tx,
        loss_kwargs=dict(
            ts_lw=0.0,
            do_modality_cl=True,
            align_pairs=align_pairs or {"tv": 1.0, "av": 1.0, "at": 1.0},
            cl_temp=cl_temp,
        ),
    )


def make_mmvts_train_step(model: MMVTSModel, tx, loss_kwargs: Dict):
    """Jitted train step over the multimodal composite objective."""
    import optax
    from spokennlp_tpu.train.train_step import TrainState

    def loss_fn(params, batch, rng):
        out = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            batch["clip_positions"],
            batch["clip_mask"],
            vis_feats=batch.get("vis_feats"),
            audio_feats=batch.get("audio_feats"),
            deterministic=False,
            rngs={"dropout": rng},
        )
        kwargs = dict(loss_kwargs)
        if "topic_cl_anchor_valid" in batch:
            # host-sampled list-mode topic-CL gather indices (mmvts_losses.
            # build_topic_cl_list_indices, run in the data pipeline)
            kwargs["topic_cl_indices"] = {
                "anchor_valid": batch["topic_cl_anchor_valid"],
                "pos": batch["topic_cl_pos"],
                "neg": batch["topic_cl_neg"],
            }
        return mmvts_losses.mmvts_total_loss(
            model.mm_cfg, out, batch["clip_labels"], batch["clip_mask"], **kwargs
        )

    def step(state, batch, rng):
        rng = fast_dropout_key(jax.random.fold_in(rng, state.step))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        scalars = {k: v for k, v in aux.items() if getattr(v, "ndim", 0) == 0}
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            scalars,
        )

    return jax.jit(step, donate_argnums=(0,))
