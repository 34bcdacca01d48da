"""MUG Track 3: topic title generation CLI.

Counterpart of the reference's PALM 2.0 driver (reference: alimeeting4mug/
src/topic_title_generation/palm_subtitle_generation.py:222-403): trains the
seq2seq model on (topic text -> title) pairs with the noam LR schedule
(:326), decodes per epoch with beam search, reports multi-reference rouge
(average over the annotators' candidate titles), writes the track-3
submission JSON for the test split.

Input: MUG meeting jsonl (projects/mug/data.py schema). Tokenization via
--model_name_or_path HF tokenizer or the char-level fallback (CJK-friendly).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_file", required=True)
    p.add_argument("--eval_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--max_source_length", type=int, default=512)
    p.add_argument("--max_target_length", type=int, default=32)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--num_beams", type=int, default=4)
    p.add_argument("--noam_factor", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--clip_grad_norm", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off, the "
                   "reference PALM recipe's default)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_hidden_layers", type=int, default=4)
    p.add_argument("--num_decoder_layers", type=int, default=4)
    p.add_argument("--num_attention_heads", type=int, default=4)
    p.add_argument("--intermediate_size", type=int, default=1024)
    p.add_argument(
        "--model_arch", default="seq2seq", choices=["seq2seq", "palm"],
        help="palm = the PALM 2.0 architecture (pre-norm OpenNMT decoder + "
        "pointer-generator, models/palm.py) the reference baseline uses "
        "(palm_subtitle_generation.py:371-396); seq2seq = the compact "
        "post-norm encoder-decoder",
    )
    p.add_argument(
        "--palm_checkpoint", default=None,
        help="path to a ModelScope palm_v2 torch checkpoint "
        "(pytorch_model.bin or dir containing it) converted via "
        "hf_convert.palm_to_params",
    )
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.eval.rouge import rouge_scores
    from spokennlp_tpu.models.seq2seq import (
        Seq2SeqConfig,
        Seq2SeqModel,
        beam_decode,
        seq2seq_loss,
    )
    from spokennlp_tpu.projects.mug.data import parse_title_generation, read_jsonl
    from spokennlp_tpu.train.optim import noam_schedule
    from spokennlp_tpu.train.train_step import TrainState, create_train_state

    # ---------------- tokenizer
    tok = None
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name_or_path)
        except Exception:
            tok = None
    if tok is not None:
        encode = lambda s: tok(s, add_special_tokens=False)["input_ids"]
        decode = lambda ids: tok.decode(ids, skip_special_tokens=True)
        vocab_size = len(tok)
        pad_id, bos_id, eos_id = tok.pad_token_id or 0, tok.cls_token_id or 101, tok.sep_token_id or 102
    else:
        # char-level vocab built from the corpus (CJK meeting text)
        chars = {}

        def encode(s):
            return [chars.setdefault(c, len(chars) + 4) for c in s]

        inv = {}

        def decode(ids):
            if not inv or len(inv) != len(chars):
                inv.clear()
                inv.update({v: k for k, v in chars.items()})
            return "".join(inv.get(int(i), "") for i in ids if int(i) > 3)

        pad_id, bos_id, eos_id = 0, 1, 2
        vocab_size = None  # resolved after corpus scan

    def pairs_from(path, require_refs):
        """All topics (for decoding/submission) or only reference-titled
        topics (for training/rouge). Keeps the topic's segment-end sentence
        id so the submission aligns with the label file
        (projects/mug/evaluate.py asserts equal topic counts per meeting)."""
        out = []
        for meeting in read_jsonl(path):
            for t in parse_title_generation(meeting):
                refs = [x for x in t["titles"] if x]
                if not t["source"]:
                    continue
                if require_refs and not refs:
                    continue
                out.append({"source": t["source"], "titles": refs,
                            "meeting_key": t["meeting_key"],
                            "segment_id": int(t["topic_span"][1])})
        return out

    train_pairs = pairs_from(args.train_file, require_refs=True)
    eval_pairs = pairs_from(args.eval_file, require_refs=False)
    assert train_pairs, "no (topic, title) training pairs"

    # build char vocab over everything before sizing the model
    if tok is None:
        for r in train_pairs + eval_pairs:
            encode(r["source"])
            for t in r["titles"]:
                encode(t)
        vocab_size = len(chars) + 4

    S, T = args.max_source_length, args.max_target_length

    def featurize(rows):
        n = len(rows)
        ids = np.zeros((n, S), np.int32)
        am = np.zeros((n, S), np.int32)
        dec_in = np.full((n, T), pad_id, np.int32)
        dec_am = np.zeros((n, T), np.int32)
        labels = np.full((n, T), -100, np.int32)
        for i, r in enumerate(rows):
            src = encode(r["source"])[:S]
            ids[i, : len(src)] = src
            am[i, : len(src)] = 1
            ref = r["titles"][0] if r["titles"] else ""
            tgt = encode(ref)[: T - 1] + [eos_id]
            dec_in[i, 0] = bos_id
            dec_in[i, 1 : len(tgt)] = tgt[:-1]
            dec_am[i, : len(tgt)] = 1
            labels[i, : len(tgt)] = tgt
        return {"input_ids": ids, "attention_mask": am,
                "decoder_input_ids": dec_in, "decoder_attention_mask": dec_am,
                "labels": labels}

    enc_cfg = EncoderConfig(
        vocab_size=vocab_size, hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers, num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_position_embeddings=max(S, 512), add_pooler=False,
        pad_token_id=pad_id,
    )
    s2s_cfg = Seq2SeqConfig(
        vocab_size=vocab_size, hidden_size=args.hidden_size,
        num_decoder_layers=args.num_decoder_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        max_target_length=T, bos_token_id=bos_id, eos_token_id=eos_id,
        pad_token_id=pad_id,
    )
    if args.model_arch == "palm":
        from spokennlp_tpu.models.palm import (
            PalmConfig,
            PalmModel,
            palm_beam_decode,
            palm_loss,
        )

        palm_cfg = PalmConfig(
            vocab_size=vocab_size, hidden_size=args.hidden_size,
            num_decoder_layers=args.num_decoder_layers,
            num_heads=args.num_attention_heads,
            intermediate_size=args.intermediate_size,
            max_target_length=T, bos_token_id=bos_id, eos_token_id=eos_id,
            pad_token_id=pad_id,
        )
        model = PalmModel(enc_cfg, palm_cfg)
        loss_fn_impl, decode_fn_impl = palm_loss, palm_beam_decode
    else:
        model = Seq2SeqModel(enc_cfg, s2s_cfg)
        loss_fn_impl, decode_fn_impl = seq2seq_loss, beam_decode
    feats = featurize(train_pairs)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(feats["input_ids"][:1]),
        jnp.asarray(feats["attention_mask"][:1]),
        jnp.asarray(feats["decoder_input_ids"][:1]),
    )["params"]
    if args.model_arch == "palm" and args.palm_checkpoint:
        import torch as _torch

        from spokennlp_tpu.models import hf_convert

        ckpt = args.palm_checkpoint
        if os.path.isdir(ckpt):
            ckpt = os.path.join(ckpt, "pytorch_model.bin")
        sd = {
            k: v.numpy()
            for k, v in _torch.load(ckpt, map_location="cpu").items()
        }
        params = hf_convert.palm_to_params(
            sd, enc_cfg, args.num_decoder_layers
        )
        print(f"loaded PALM checkpoint from {ckpt}")

    # noam LR, the PALM recipe (palm_subtitle_generation.py:326)
    tx = optax.adam(
        noam_schedule(args.hidden_size, args.noam_factor, args.warmup_steps)
    )
    if args.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad_norm), tx)
    state = create_train_state(params, tx)

    @jax.jit
    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return loss_fn_impl(model, p, batch, rng=rng, deterministic=False)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        up, opt = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(step=state.step + 1,
                       params=optax.apply_updates(state.params, up),
                       opt_state=opt),
            loss,
        )

    rng = jax.random.PRNGKey(args.seed)
    data_rng = np.random.default_rng(args.seed)
    bs = args.per_device_train_batch_size
    n = len(train_pairs)
    efeats = featurize(eval_pairs)  # loop-invariant: featurize eval ONCE

    def decode_eval(params):
        hyps = []
        for s in range(0, len(eval_pairs), bs):
            e = min(s + bs, len(eval_pairs))
            sl = slice(s, e)
            gen = decode_fn_impl(
                model, params,
                jnp.asarray(efeats["input_ids"][sl]),
                jnp.asarray(efeats["attention_mask"][sl]),
                num_beams=args.num_beams, max_len=T,
            )
            for row in np.asarray(gen):
                toks = [int(t) for t in row[1:]]
                if eos_id in toks:
                    toks = toks[: toks.index(eos_id)]
                hyps.append(decode(toks))
        return hyps

    def rouge_eval(hyps):
        # multi-reference rouge averaged over the annotators' candidates
        # (challenge_evaluate.py topic_title_generation_evaluate:349); only
        # topics WITH references contribute (test splits may have none)
        r1 = rl = m = 0.0
        for hyp, r in zip(hyps, eval_pairs):
            if not r["titles"]:
                continue
            scores = [rouge_scores([hyp], [ref]) for ref in r["titles"]]
            r1 += float(np.mean([sc["rouge-1"]["f"] for sc in scores]))
            rl += float(np.mean([sc["rouge-l"]["f"] for sc in scores]))
            m += 1
        m = m or 1
        return {"rouge1": 100 * r1 / m, "rougeL": 100 * rl / m}

    history = []
    hyps = []
    for epoch in range(1, args.num_train_epochs + 1):
        order = data_rng.permutation(n)
        losses = []
        for s in range(0, n, bs):
            take = order[s : s + bs].tolist()
            while len(take) < bs:
                take.append(take[0])
            batch = {k: jnp.asarray(v[take]) for k, v in feats.items()}
            state, loss = train_step(state, batch, rng)
            losses.append(float(loss))
        hyps = decode_eval(state.params)
        row = {"epoch": epoch, "train_loss": float(np.mean(losses)),
               **rouge_eval(hyps)}
        history.append(row)
        print(json.dumps(row))
    if not history:  # decode-only invocation (--num_train_epochs 0)
        hyps = decode_eval(state.params)
        history.append({"epoch": 0, **rouge_eval(hyps)})

    # track-3 submission for the eval split
    from spokennlp_tpu.projects.mug.data import title_generation_submission

    per_meeting = {}
    for hyp, r in zip(hyps, eval_pairs):
        # ids = the topic's segment-end sentence id, matching the label file
        per_meeting.setdefault(r["meeting_key"], []).append(
            {"id": r["segment_id"], "title": hyp}
        )
    sub = title_generation_submission(
        list(per_meeting), list(per_meeting.values())
    )
    with open(os.path.join(args.output_dir, "track3_submission.json"), "w") as f:
        json.dump(sub, f, ensure_ascii=False, indent=2)
    with open(os.path.join(args.output_dir, "ttg_results.json"), "w") as f:
        json.dump(history, f, indent=2)
    return {"history": history, "final": history[-1]}


if __name__ == "__main__":
    main()
