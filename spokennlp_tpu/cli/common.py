"""Shared CLI plumbing: tokenizer/model/checkpoint resolution.

Preserves the reference flag surface (HfArgumentParser dataclasses at
emnlp2023-topic_segmentation/src/arguments.py:6-259) on argparse, and
resolves encoders from local HF checkpoints (torch -> flax conversion) or
random initialization when no checkpoint is reachable.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, TrainConfig, WindowingConfig


def add_model_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("model")
    g.add_argument("--model_name_or_path", default=None)
    g.add_argument("--vocab_file", default=None)
    g.add_argument("--ts_score_predictor", default="lt", choices=["lt", "cos"])
    g.add_argument("--ts_score_predictor_cos_temp", type=float, default=1.0)
    g.add_argument("--ts_loss_weight", type=float, default=1.0)
    g.add_argument("--cl_loss_weight", type=float, default=0.0)
    g.add_argument("--tssp_loss_weight", type=float, default=0.0)
    g.add_argument("--cl_temp", type=float, default=0.1)
    g.add_argument("--cl_anchor_level", default="eop_list")
    g.add_argument("--cl_positive_k", type=int, default=1)
    g.add_argument("--cl_negative_k", type=int, default=1)
    g.add_argument("--focal_loss_gamma", type=float, default=0.0)
    g.add_argument("--weight_label_zero", type=float, default=0.5)
    g.add_argument("--do_da_ts", action="store_true")
    g.add_argument("--do_tssp", action="store_true")
    g.add_argument("--tssp_ablation", default="none")
    g.add_argument("--attention_type", default="dense",
                   choices=["dense", "sliding_window", "bigbird", "ponet"])
    g.add_argument("--attention_window", type=int, default=512)
    g.add_argument("--attention_impl", default="auto",
                   choices=["auto", "einsum", "flash", "pallas", "fused",
                            "stack", "train_fused"],
                   help="attention kernel selection (auto = fused Pallas on "
                   "TPU, einsum elsewhere)")
    # HF Trainer flag name; remats each layer on backward (jax.checkpoint)
    g.add_argument("--gradient_checkpointing", action="store_true")
    # architecture knobs (defaults = BERT-base; used when training from
    # scratch / smoke-testing without a checkpoint)
    g.add_argument("--hidden_size", type=int, default=768)
    g.add_argument("--num_hidden_layers", type=int, default=12)
    g.add_argument("--num_attention_heads", type=int, default=12)
    g.add_argument("--intermediate_size", type=int, default=3072)


def add_data_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("data")
    g.add_argument("--dataset_name", default="wiki_section")
    g.add_argument("--data_dir", default=None)
    g.add_argument("--dataset_config_file", default=None,
                   help="config.ini with a [mapping] section")
    g.add_argument("--max_seq_length", type=int, default=512)
    g.add_argument("--max_train_samples", type=int, default=None)
    g.add_argument("--max_eval_samples", type=int, default=None)
    g.add_argument("--max_predict_samples", type=int, default=None)
    g.add_argument("--threshold", type=float, default=None)
    g.add_argument("--topk", type=int, default=None)
    g.add_argument("--topk_with_threshold", action="store_true")
    g.add_argument("--f1_at_k", type=int, default=None)
    g.add_argument("--test_data_name", default="test")


def add_training_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("training")
    g.add_argument("--output_dir", required=True)
    g.add_argument("--do_train", action="store_true")
    g.add_argument("--do_eval", action="store_true")
    g.add_argument("--do_predict", action="store_true")
    g.add_argument("--learning_rate", type=float, default=5e-5)
    g.add_argument("--num_train_epochs", type=float, default=5.0)
    g.add_argument("--per_device_train_batch_size", type=int, default=2)
    g.add_argument("--per_device_eval_batch_size", type=int, default=8)
    g.add_argument("--gradient_accumulation_steps", type=int, default=4)
    g.add_argument("--warmup_ratio", type=float, default=0.0)
    g.add_argument("--weight_decay", type=float, default=0.01)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--eval_cnt", type=int, default=5)
    g.add_argument("--metric_for_best_model", default="f1")
    g.add_argument("--save_total_limit", type=int, default=2)
    g.add_argument("--resume_from_checkpoint", default=None)
    g.add_argument("--overwrite_output_dir", action="store_true")
    g.add_argument("--save_hf_format", action="store_true",
                   help="also export <output_dir>/final_model_hf in the "
                   "save_pretrained (pytorch_model.bin) format the reference "
                   "writes (alimeeting4mug/src/models/trainer.py:33-60), so "
                   "ModelScope/transformers pipelines can consume the result")
    g.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    # SPMD: data-parallel over all local devices by default (the reference's
    # torch.distributed.launch DDP); optional tensor-parallel axis + explicit
    # multi-host bootstrap
    g.add_argument("--model_parallel_size", type=int, default=1)
    g.add_argument("--preprocessing_num_workers", type=int, default=1)
    g.add_argument("--report_to", default=None, choices=[None, "tensorboard"],
                   help="tensorboard writes event files under "
                   "<output_dir>/tensorboard")
    g.add_argument("--jax_distributed", action="store_true",
                   help="call jax.distributed.initialize (multi-host; "
                   "coordinator from JAX_COORDINATOR_ADDRESS et al.)")


def resolve_tokenizer(args) -> Tuple[Callable[[str], List[int]], dict]:
    """Return (tokenize_fn, special_ids {cls, pad, bos/eos})."""
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name_or_path)
            if tok.bos_token_id is None:
                tok.add_special_tokens({"bos_token": "[BOS]"})
            special = {
                "cls": tok.cls_token_id or tok.bos_token_id,
                "pad": tok.pad_token_id or 0,
                "bos": tok.bos_token_id,
                "sep": tok.sep_token_id if tok.sep_token_id is not None else 102,
                "vocab_size": len(tok),
            }
            if tok.mask_token_id is not None:
                special["mask"] = tok.mask_token_id
            return (lambda s: tok(s, add_special_tokens=False)["input_ids"]), special
        except Exception:
            pass
    if args.vocab_file:
        from spokennlp_tpu.utils.tokenization import FullTokenizer

        tok = FullTokenizer.from_vocab_file(args.vocab_file)
        vocab = tok.vocab
        bos = vocab.get("[BOS]", vocab.get("[unused1]", 1))
        special = {
            "cls": vocab.get("[CLS]", 101),
            "pad": vocab.get("[PAD]", 0),
            "bos": bos,
            "sep": vocab.get("[SEP]", min(102, len(vocab) - 1)),
            "vocab_size": len(vocab),
        }
        if "[MASK]" in vocab:
            special["mask"] = vocab["[MASK]"]
        return tok.encode, special
    # fallback hash tokenizer (smoke tests without vocab assets)
    V = 30522
    special = {"cls": 101, "pad": 0, "bos": 1, "sep": 102, "mask": 103,
               "vocab_size": V}

    def hash_tokenize(s: str) -> List[int]:
        return [1000 + (hash(w) % (V - 1100)) for w in s.split()] or [1000]

    return hash_tokenize, special


def build_configs(args, special):
    import jax.numpy as jnp

    enc = EncoderConfig(
        vocab_size=special["vocab_size"],
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_position_embeddings=max(args.max_seq_length, 512),
        attention_type=args.attention_type,
        attention_window=args.attention_window,
        attention_impl=getattr(args, "attention_impl", "auto"),
        pad_token_id=special["pad"],
        remat=getattr(args, "gradient_checkpointing", False),
    )
    task = TopicSegConfig(
        ts_score_predictor=args.ts_score_predictor,
        ts_score_predictor_cos_temp=args.ts_score_predictor_cos_temp,
        ts_loss_weight=args.ts_loss_weight,
        cl_loss_weight=args.cl_loss_weight,
        tssp_loss_weight=args.tssp_loss_weight,
        cl_temp=args.cl_temp,
        cl_anchor_level=args.cl_anchor_level,
        cl_positive_k=args.cl_positive_k,
        cl_negative_k=args.cl_negative_k,
        focal_loss_gamma=args.focal_loss_gamma,
        weight_label_zero=args.weight_label_zero,
        do_da_ts=args.do_da_ts,
        do_tssp=args.do_tssp,
        tssp_ablation=args.tssp_ablation,
    )
    wcfg = WindowingConfig(
        max_seq_length=args.max_seq_length,
        cls_token_id=special["cls"],
        pad_token_id=special["pad"],
        bos_token_id=special["bos"],
    )
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        num_train_epochs=args.num_train_epochs,
        per_device_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        warmup_ratio=args.warmup_ratio,
        weight_decay=args.weight_decay,
        seed=args.seed,
        eval_cnt=args.eval_cnt,
        dtype=args.dtype,
        checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
        save_total_limit=args.save_total_limit,
        model_parallel_size=getattr(args, "model_parallel_size", 1),
        preprocessing_num_workers=getattr(args, "preprocessing_num_workers", 1),
        tensorboard_dir=(
            os.path.join(args.output_dir, "tensorboard")
            if getattr(args, "report_to", None) == "tensorboard"
            else None
        ),
    )
    return enc, task, wcfg, tcfg


def maybe_init_distributed(args):
    """Multi-host bootstrap behind --jax_distributed (no-op single-host)."""
    if getattr(args, "jax_distributed", False):
        from spokennlp_tpu.parallel import dist

        dist.initialize_distributed()


def maybe_load_pretrained(args, enc_cfg):
    """Checkpoint dir -> (config, trunk params), else None.

    Accepts framework-native checkpoints (params.msgpack + config.json) and
    HF torch checkpoint dirs (converted on the fly)."""
    path = args.model_name_or_path
    if not path or not os.path.isdir(path):
        return None
    from spokennlp_tpu.models import checkpoint_io

    if checkpoint_io.is_native_checkpoint(path):
        params, cfg = checkpoint_io.load_checkpoint(path)
        return (cfg or enc_cfg), params
    try:
        import torch
        from transformers import AutoConfig, AutoModel

        from spokennlp_tpu.models import hf_convert

        hf_cfg = AutoConfig.from_pretrained(path)
        model = AutoModel.from_pretrained(path)
        sd = hf_convert.torch_state_dict_to_numpy(model.state_dict())
        if hf_cfg.model_type == "longformer":
            cfg = hf_convert.hf_longformer_config_to_encoder_config(hf_cfg)
            return cfg, hf_convert.longformer_to_encoder_params(sd, cfg)
        if hf_cfg.model_type == "electra":
            cfg = hf_convert.hf_electra_config_to_encoder_config(hf_cfg)
            return cfg, hf_convert.electra_to_encoder_params(sd, cfg)
        if hf_cfg.model_type == "big_bird":
            # HF BigBird keeps the BERT param layout; block-sparse structure
            # is an attention_type on our trunk (ops/bigbird_attention.py)
            import dataclasses as _dc

            cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
            cfg = _dc.replace(
                cfg,
                attention_type="bigbird",
                bigbird_block_size=getattr(hf_cfg, "block_size", 64),
                bigbird_num_random_blocks=getattr(hf_cfg, "num_random_blocks", 3),
            )
            params = hf_convert.bert_to_encoder_params(sd, cfg)
            if cfg.add_pooler and "pooler" not in params:
                # HF BigBird's pooler is a bare nn.Linear (different naming);
                # the topic-seg head doesn't use it
                cfg = _dc.replace(cfg, add_pooler=False)
            return cfg, params
        cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
        return cfg, hf_convert.bert_to_encoder_params(sd, cfg)
    except Exception as e:  # pragma: no cover
        print(f"[warn] could not load pretrained weights from {path}: {e}")
        return None


def resize_word_embeddings(params, enc_cfg, new_vocab_size: int, seed: int = 0):
    """Grow word_embeddings to ``new_vocab_size`` rows; returns (params, cfg).

    The reference calls model.resize_token_embeddings(len(tokenizer)) after
    adding the [BOS] special token (ts_sentence_seq_labeling.py:282-284);
    without this, the new token id silently aliases the last vocab row
    (jnp.take clamps out-of-range indices). New rows are drawn N(0, 0.02)
    like HF's resize. Accepts either a trunk param dict (embeddings at the
    top) or a full task-model dict (under "encoder")."""
    import dataclasses

    trunk = params.get("encoder", params)
    emb = np.asarray(trunk["embeddings"]["word_embeddings"]["embedding"])
    old_vocab, width = emb.shape
    if new_vocab_size <= old_vocab:
        if enc_cfg.vocab_size != old_vocab:
            enc_cfg = dataclasses.replace(enc_cfg, vocab_size=old_vocab)
        return params, enc_cfg
    extra = (
        np.random.default_rng(seed)
        .normal(0.0, 0.02, size=(new_vocab_size - old_vocab, width))
        .astype(emb.dtype)
    )
    new_trunk = dict(trunk)
    new_emb_scope = dict(trunk["embeddings"])
    new_emb_scope["word_embeddings"] = {
        "embedding": np.concatenate([emb, extra], axis=0)
    }
    new_trunk["embeddings"] = new_emb_scope
    if "encoder" in params:
        params = dict(params)
        params["encoder"] = new_trunk
    else:
        params = new_trunk
    return params, dataclasses.replace(enc_cfg, vocab_size=new_vocab_size)


def load_docs(args, tokenize_fn):
    from spokennlp_tpu.data import corpora

    data_dir = args.data_dir
    if data_dir is None and args.dataset_config_file:
        mapping = corpora.dataset_folder_mapping(args.dataset_config_file)
        data_dir = mapping[args.dataset_name]
    assert data_dir, "need --data_dir or --dataset_config_file"
    splits = corpora.load_dataset_splits(args.dataset_name, data_dir)
    out = {}
    for split, examples in splits.items():
        limit = {
            "train": args.max_train_samples,
            "validation": args.max_eval_samples,
            "test": args.max_predict_samples,
        }[split]
        if limit:
            examples = examples[:limit]
        out[split] = corpora.tokenize_examples(examples, tokenize_fn)
    return out
