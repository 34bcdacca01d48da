"""SLD training CLI: discrete-speech-token ASR with smoothed label distillation.

Counterpart of the reference's stage-7 `accelerate launch run_clm.py`
(reference: sld/run.sh:231, run_clm.py:350-905): packed
speech+text blocks, composite CE+CE+T^2*KL loss with 30% input time-masking,
per-epoch decode -> WER/CER, best-checkpoint retention.

Input jsonl rows: {"speech_tokens": [int, ...], "text": "..."} — the output
of the k-means + dedupe pipeline (projects/sld_pipeline.py; reference
stages 2-6). Text is tokenized with the HF tokenizer at --model_name_or_path
when available, else a corpus-built word vocabulary (exactly invertible, so
WER is well defined either way).
"""

from __future__ import annotations

import argparse
import json
import os


def _load_rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _word_vocab(rows_list):
    vocab = {}
    for rows in rows_list:
        for r in rows:
            for w in r["text"].split():
                vocab.setdefault(w, len(vocab))
    inv = {i: w for w, i in vocab.items()}
    return (
        lambda s: [vocab[w] for w in s.split()],
        lambda ids: " ".join(inv.get(int(i), "<unk>") for i in ids),
        len(vocab),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_file", required=True)
    p.add_argument("--eval_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name_or_path", default=None,
                   help="HF GPT-2 checkpoint dir (tokenizer + weights)")
    p.add_argument("--vocab_size_speech", type=int, default=2000)
    p.add_argument("--block_size", type=int, default=1024)
    p.add_argument("--max_text_length", type=int, default=256)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--lr_scheduler_type", default="linear",
                   choices=["linear", "constant"],
                   help="reference parity: run_clm.py uses get_scheduler "
                   "with the 'linear' default (decay to 0 over training)")
    p.add_argument("--num_warmup_steps", type=int, default=0)
    p.add_argument("--weight_ce_speech", type=float, default=1.0)
    p.add_argument("--weight_ce_text", type=float, default=1.0)
    p.add_argument("--weight_kl_speech", type=float, default=1.0)
    p.add_argument("--kl_temperature", type=float, default=1.0)
    p.add_argument("--time_masking", type=float, default=0.3)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--decode_max_len", type=int, default=None)
    p.add_argument("--clip_grad_norm", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off, matching "
                   "the reference run_clm.py loop)")
    p.add_argument("--seed", type=int, default=42)
    # tiny-model knobs for smoke runs without a checkpoint
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=None,
                   help="GPT-2 n_inner; default 4*hidden (HF semantics)")
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import numpy as np
    import optax

    from spokennlp_tpu.models.gpt2 import GPT2Config, GPT2LMModel
    from spokennlp_tpu.projects.sld import SLDConfig, SLDTrainer, pack_example

    train_rows = _load_rows(args.train_file)
    eval_rows = _load_rows(args.eval_file)

    tok = None
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name_or_path)
        except Exception:
            tok = None
    if tok is not None:
        encode = lambda s: tok(s, add_special_tokens=False)["input_ids"]
        detok = lambda ids: tok.decode(ids)
        gpt_vocab = len(tok)
    else:
        encode, detok, gpt_vocab = _word_vocab([train_rows, eval_rows])
        gpt_vocab += 1  # reserve eos

    cfg = SLDConfig(
        gpt_vocab_size=gpt_vocab,
        vocab_size_speech=args.vocab_size_speech,
        block_size=args.block_size,
        max_text_length=args.max_text_length,
        weight_ce_speech=args.weight_ce_speech,
        weight_ce_text=args.weight_ce_text,
        weight_kl_speech=args.weight_kl_speech,
        kl_temperature=args.kl_temperature,
        time_masking=args.time_masking,
        eos_token_id=gpt_vocab - 1 if tok is None else tok.eos_token_id,
    )

    def packs(rows):
        out, texts = [], []
        for r in rows:
            ex = pack_example(r["speech_tokens"], encode(r["text"]), cfg)
            if ex is not None:
                out.append(ex)
                texts.append(r["text"])
        return out, texts

    train_ex, _ = packs(train_rows)
    eval_ex, eval_texts = packs(eval_rows)

    gcfg = GPT2Config(
        vocab_size=cfg.total_vocab,
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size or 4 * args.hidden_size,
        max_position_embeddings=max(args.block_size, 1024),
    )
    model = GPT2LMModel(gcfg)
    params = None
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path):
        try:
            from transformers import AutoModelForCausalLM

            from spokennlp_tpu.models.gpt2 import (
                gpt2_hf_to_params,
                resize_token_embeddings,
            )
            from spokennlp_tpu.models.hf_convert import torch_state_dict_to_numpy

            hf = AutoModelForCausalLM.from_pretrained(args.model_name_or_path)
            sd = torch_state_dict_to_numpy(hf.state_dict())
            params = gpt2_hf_to_params(sd, gcfg)
            params = resize_token_embeddings(params, cfg.total_vocab, args.seed)
            print("loaded + vocab-extended pretrained GPT-2")
        except Exception as e:
            print(f"[warn] pretrained load failed ({e}); training from scratch")
            params = None

    # reference-parity LR schedule (run_clm.py: accelerate get_scheduler,
    # default "linear" = optional warmup then linear decay to 0)
    if args.lr_scheduler_type == "linear":
        steps_per_epoch = max(
            1,
            (len(train_ex) + args.per_device_train_batch_size - 1)
            // args.per_device_train_batch_size,
        )
        total_steps = steps_per_epoch * args.num_train_epochs
        from spokennlp_tpu.train.optim import linear_warmup_schedule

        lr = linear_warmup_schedule(
            args.learning_rate, total_steps, args.num_warmup_steps
        )
    else:
        lr = args.learning_rate

    tx = optax.adamw(lr)
    if args.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad_norm), tx)
    trainer = SLDTrainer(
        model, cfg, tx,
        train_ex, eval_ex, eval_texts, detok,
        batch_size=args.per_device_train_batch_size,
        num_epochs=args.num_train_epochs,
        seed=args.seed,
        decode_max_len=args.decode_max_len or args.block_size,
        num_beams=args.num_beams,
        checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
        params=params,
    )
    res = trainer.train()
    with open(os.path.join(args.output_dir, "sld_results.json"), "w") as f:
        json.dump(res, f, indent=2, default=float)
    print(json.dumps(res["final"], indent=2, default=float))
    return res


if __name__ == "__main__":
    main()
