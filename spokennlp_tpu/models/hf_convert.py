"""Convert HuggingFace torch checkpoints into spokennlp_tpu param pytrees.

The reference loads pretrained encoders straight from HF/ModelScope
(reference: emnlp2023-topic_segmentation/src/ts_sentence_seq_labeling.py:
188-269). Here the torch state dict is repacked into the trunk's layout:
fused QKV kernels of shape (H, 3, num_heads, head_dim), Flax (in, out) kernel
orientation, LayerNorm scale/bias naming.

All functions operate on a ``{name: np.ndarray}`` state dict so torch is only
an optional import at the call site.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from spokennlp_tpu.configs import EncoderConfig


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _linear(sd: Dict[str, np.ndarray], prefix: str):
    """torch Linear -> flax Dense: kernel (in, out), bias (out,)."""
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "bias": sd[prefix + ".bias"],
    }


def _layernorm(sd: Dict[str, np.ndarray], prefix: str):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def bert_to_encoder_params(
    sd: Dict[str, np.ndarray],
    cfg: EncoderConfig,
    prefix: str = "",
) -> Dict:
    """Map an HF ``BertModel`` state dict onto the Encoder param tree.

    ``prefix`` handles nesting, e.g. "bert." for BertForTokenClassification.
    Works for any BERT-architecture checkpoint (BERT, StructBERT, Chinese
    variants) since they share the module layout.
    """
    H, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    p = prefix

    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": sd[p + "embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd[p + "embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd[p + "embeddings.token_type_embeddings.weight"]
            },
            "LayerNorm": _layernorm(sd, p + "embeddings.LayerNorm"),
        }
    }

    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}."
        q_k = sd[lp + "attention.self.query.weight"].T.reshape(H, nh, hd)
        k_k = sd[lp + "attention.self.key.weight"].T.reshape(H, nh, hd)
        v_k = sd[lp + "attention.self.value.weight"].T.reshape(H, nh, hd)
        qkv_kernel = np.stack([q_k, k_k, v_k], axis=1)  # (H, 3, nh, hd)
        q_b = sd[lp + "attention.self.query.bias"].reshape(nh, hd)
        k_b = sd[lp + "attention.self.key.bias"].reshape(nh, hd)
        v_b = sd[lp + "attention.self.value.bias"].reshape(nh, hd)
        qkv_bias = np.stack([q_b, k_b, v_b], axis=0)  # (3, nh, hd)

        out_kernel = sd[lp + "attention.output.dense.weight"].T.reshape(nh, hd, H)

        params[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {
                    "kernel": out_kernel,
                    "bias": sd[lp + "attention.output.dense.bias"],
                },
            },
            "attention_ln": _layernorm(sd, lp + "attention.output.LayerNorm"),
            "mlp_in": _linear(sd, lp + "intermediate.dense"),
            "mlp_out": _linear(sd, lp + "output.dense"),
            "mlp_ln": _layernorm(sd, lp + "output.LayerNorm"),
        }

    if cfg.add_pooler and (p + "pooler.dense.weight") in sd:
        params["pooler"] = _linear(sd, p + "pooler.dense")

    return params


def hf_bert_config_to_encoder_config(hf_config, **overrides) -> EncoderConfig:
    """Translate a transformers BertConfig into an EncoderConfig."""
    kwargs = dict(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout_prob,
        attention_dropout=hf_config.attention_probs_dropout_prob,
        hidden_act=hf_config.hidden_act,
        pad_token_id=hf_config.pad_token_id or 0,
    )
    kwargs.update(overrides)
    return EncoderConfig(**kwargs)
