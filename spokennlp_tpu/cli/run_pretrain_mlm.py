"""MLM+NSP further-pretraining CLI (the AID recipe's missing counterpart).

The reference further-pretrains BERT on meeting text with Google's vendored
tooling (reference: action-item-detection/script/run_pretraining.py +
create_pretraining_data.py; README's further-pretraining recipe). This CLI
covers that capability: meetings jsonl (run_aid schema,
{"sentences": [{"text": ...}]}) or a plain text file (one sentence per
line, blank line = document break) -> MLM+NSP pretraining over the shared
Encoder trunk -> native checkpoint whose trunk any task CLI can consume via
--model_name_or_path.

Example:
  python -m spokennlp_tpu.cli.run_pretrain_mlm --train_file meetings.jsonl \
      --output_dir ./pretrained --num_train_epochs 3
"""

from __future__ import annotations

import argparse
import json
import os


def load_documents(path, tokenize_fn):
    """-> list of documents, each a list of per-sentence token-id lists."""
    docs = []
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                sents = [s["text"] if isinstance(s, dict) else s
                         for s in row["sentences"]]
                toks = [tokenize_fn(s) for s in sents]
                docs.append([t for t in toks if t])
    else:  # plain text: blank-line-separated documents
        cur = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    if cur:
                        docs.append(cur)
                        cur = []
                    continue
                t = tokenize_fn(line)
                if t:
                    cur.append(t)
        if cur:
            docs.append(cur)
    return [d for d in docs if len(d) >= 2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--vocab_file", default=None)
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--max_predictions_per_seq", type=int, default=20)
    p.add_argument("--masked_lm_prob", type=float, default=0.15)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--num_train_epochs", type=float, default=2.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from spokennlp_tpu.cli import common
    from spokennlp_tpu.configs import EncoderConfig, TrainConfig
    from spokennlp_tpu.models import checkpoint_io
    from spokennlp_tpu.objectives.mlm import (
        BertForPreTraining,
        PretrainDataConfig,
        build_pretraining_batch,
        pretraining_loss,
    )
    from spokennlp_tpu.train import optim
    from spokennlp_tpu.train.train_step import TrainState, create_train_state

    tokenize_fn, special = common.resolve_tokenizer(args)
    dcfg = PretrainDataConfig(
        cls_token_id=special["cls"],
        sep_token_id=special["sep"],
        pad_token_id=special["pad"],
        mask_token_id=special.get("mask", 103),
    )
    # an out-of-vocab mask id silently NaNs training (OOB embedding gather;
    # found the hard way when a [MASK]-less specials dict defaulted to 103
    # against an 88-entry vocab)
    assert dcfg.mask_token_id < special["vocab_size"], (
        f"mask token id {dcfg.mask_token_id} outside vocab "
        f"{special['vocab_size']} — tokenizer must define [MASK]")
    docs = load_documents(args.train_file, tokenize_fn)
    assert docs, "no >=2-sentence documents in the corpus"

    enc_cfg = EncoderConfig(
        vocab_size=special["vocab_size"],
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_position_embeddings=max(args.max_seq_length, 512),
        pad_token_id=special["pad"],
        add_pooler=True,
    )
    pretrained = common.maybe_load_pretrained(args, enc_cfg)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = BertForPreTraining(enc_cfg, dtype=dtype)

    rng = np.random.default_rng(args.seed)
    batch0 = build_pretraining_batch(
        docs[:1], dcfg, rng, args.max_seq_length,
        args.max_predictions_per_seq, args.masked_lm_prob,
        special["vocab_size"],
    )
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(batch0["input_ids"][:1]),
        jnp.asarray(batch0["attention_mask"][:1]),
        jnp.asarray(batch0["token_type_ids"][:1]),
        jnp.asarray(batch0["mlm_positions"][:1]),
    )["params"]
    if pretrained is not None:
        cfg_loaded, trunk = pretrained
        enc_cfg = cfg_loaded
        trunk, enc_cfg = common.resize_word_embeddings(
            trunk, enc_cfg, special["vocab_size"], seed=args.seed
        )
        model = BertForPreTraining(enc_cfg, dtype=dtype)
        merged = dict(params)
        merged["encoder"] = trunk if "encoder" not in trunk else trunk["encoder"]
        params = merged

    # one featurization pass to size the schedule
    full = build_pretraining_batch(
        docs, dcfg, np.random.default_rng(args.seed), args.max_seq_length,
        args.max_predictions_per_seq, args.masked_lm_prob, special["vocab_size"],
    )
    n = full["input_ids"].shape[0]
    bs = args.per_device_train_batch_size
    steps_per_epoch = max(n // bs, 1)
    total_steps = max(int(steps_per_epoch * args.num_train_epochs), 1)
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        gradient_accumulation_steps=1,
        seed=args.seed,
    )
    tx = optim.make_optimizer(tcfg, total_steps)
    state = create_train_state(params, tx)

    @jax.jit
    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            out = model.apply(
                {"params": p},
                batch["input_ids"],
                batch["attention_mask"],
                batch["token_type_ids"],
                batch["mlm_positions"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            return pretraining_loss(out, batch)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        up, opt = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(step=state.step + 1,
                       params=optax.apply_updates(state.params, up),
                       opt_state=opt),
            {"loss": loss, **aux},
        )

    key = jax.random.PRNGKey(args.seed)
    history = []
    step = 0
    epoch = 0
    while step < total_steps:
        epoch += 1
        # re-sample masking every epoch (the reference regenerates tfrecords
        # with dupe_factor; fresh masks per epoch is the same idea)
        full = build_pretraining_batch(
            docs, dcfg, rng, args.max_seq_length,
            args.max_predictions_per_seq, args.masked_lm_prob,
            special["vocab_size"],
        )
        order = rng.permutation(full["input_ids"].shape[0])
        for s in range(0, len(order), bs):
            take = order[s : s + bs].tolist()
            while len(take) < bs:
                take.append(take[0])
            jb = {k: jnp.asarray(v[take]) for k, v in full.items()}
            state, m = train_step(state, jb, key)
            step += 1
            if step >= total_steps:
                break
        history.append(
            {"epoch": epoch, "step": step,
             **{k: float(v) for k, v in m.items()}}
        )
        print(json.dumps(history[-1]))

    # save the TRUNK (top-level scope) so task CLIs can --model_name_or_path
    # it — common.maybe_load_pretrained grafts a bare trunk under "encoder"
    checkpoint_io.save_checkpoint(
        os.path.join(args.output_dir, "pretrained_model"),
        state.params["encoder"],
        enc_cfg,
    )
    with open(os.path.join(args.output_dir, "pretrain_results.json"), "w") as f:
        json.dump(history, f, indent=2)
    return {"history": history, "final": history[-1]}


if __name__ == "__main__":
    main()
