"""North-star benchmark: topic-seg inference throughput, 512-token windows/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N / 5000, ...}

Serving model selection: BASELINE.md's gate is ">= 5,000 w/s with Pk/WinDiff
within 0.2 of the PyTorch reference" — the 0.2 quality budget is part of the
metric. When a committed PARITY_DISTILL.json proves a distilled shallow
student holds that budget against the torch 12-layer reference oracle
(scripts/distill.py), the headline number is that student depth, with the
12-layer BERT-base number reported alongside; otherwise the headline stays
12-layer. Override with --layers.

Other modes (each prints its own single JSON line):
  --packed   windows/s with the packed inference engine on realistic
             ~85%-fill windows (eval/packed_inference.py semantics: block-
             diagonal attention via pack_segment_ids, per-window positions)
  --train    composite train-step throughput (anchor+DA dual forward +
             CSSL/TSSP + AdamW, train_fused kernels), windows/s trained

Measurement design for this environment: the TPU is reached through a tunnel
where every dispatch costs ~6-7 ms, a value fetch ~30 ms, and
block_until_ready does not actually synchronize — so every timed loop runs
ON DEVICE (lax.scan / fori_loop) and a single scalar fetch closes the
timing. Compile is excluded by a warmup call; --train uses the slope method
(iters 2 vs 8) to cancel the fixed fetch intercept.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def make_model(layers: int, seq_len: int, attention_impl: str, quantize: str):
    import jax.numpy as jnp

    from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
    from spokennlp_tpu.models.topic_seg import TopicSegModel

    enc = EncoderConfig(
        vocab_size=30522,
        hidden_size=768,
        num_layers=layers,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=seq_len,
        add_pooler=False,
        attention_impl=attention_impl,
        # bf16 softmax: 32% faster attention, argmax-stable for inference
        softmax_in_compute_dtype=True,
        quantize=quantize,
    )
    return TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)


def bench_dense(model, B, L, NB, repeats):
    """Dense (pad-to-512) serving throughput; returns windows/s."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        deterministic=True,
    )["params"]

    all_ids = jnp.asarray(rng.integers(1000, 30000, size=(NB, B, L)).astype(np.int32))
    all_mask = jnp.ones((NB, B, L), jnp.int32)

    @jax.jit
    def run_corpus(params, ids, mask):
        def body(carry, batch):
            bids, bmask = batch
            out = model.apply(
                {"params": params}, bids, attention_mask=bmask, deterministic=True
            )
            preds = jnp.argmax(out["token_logits"], axis=-1).astype(jnp.int32)
            return carry + preds.sum(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (ids, mask))
        return total

    _ = int(run_corpus(params, all_ids, all_mask))  # warmup / compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = int(run_corpus(params, all_ids, all_mask))
        times.append(time.perf_counter() - t0)
    return (NB * B) / min(times)


def bench_packed(model, B, L, NB, repeats, fill_mean=0.85, fill_std=0.07):
    """Packed serving throughput on realistic partially-filled windows.

    N_orig windows with content lengths ~ N(fill_mean*L, fill_std*L) are
    first-fit-decreasing packed into full sequences (the production packing
    plan, eval/packed_inference.py:pack_windows); block-diagonal attention
    via pack_segment_ids + per-window position ids keep each window's
    computation identical to unpacked. Returns (orig windows/s, fill_ratio,
    seqs/s).
    """
    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.eval.packed_inference import pack_windows

    rng = np.random.default_rng(0)
    n_orig = NB * B
    lengths = np.clip(
        rng.normal(fill_mean * L, fill_std * L, size=n_orig).astype(np.int64),
        L // 2, L,
    )
    plan = pack_windows(lengths.tolist(), L)
    P = len(plan)
    fill_ratio = float(lengths.sum()) / (n_orig * L)

    ids = np.zeros((P, L), np.int32)
    seg = np.zeros((P, L), np.int32)
    pos = np.zeros((P, L), np.int32)
    for p, item in enumerate(plan):
        for slot, (off, n) in enumerate(zip(item.offsets, item.lengths)):
            ids[p, off : off + n] = rng.integers(1000, 30000, size=n)
            seg[p, off : off + n] = slot + 1
            pos[p, off : off + n] = np.arange(n)

    # grid of full batches; tail padded with empty (fully masked) sequences
    nb2 = (P + B - 1) // B
    grid = lambda a: np.concatenate(
        [a, np.zeros((nb2 * B - P,) + a.shape[1:], a.dtype)], 0
    ).reshape(nb2, B, L)
    g_ids, g_seg, g_pos = map(jnp.asarray, (grid(ids), grid(seg), grid(pos)))

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        deterministic=True,
    )["params"]

    @jax.jit
    def run_corpus(params, ids, seg, pos):
        def body(carry, batch):
            bids, bseg, bpos = batch
            out = model.apply(
                {"params": params},
                bids,
                attention_mask=(bseg > 0).astype(jnp.int32),
                position_ids=bpos,
                pack_segment_ids=bseg,
                deterministic=True,
            )
            preds = jnp.argmax(out["token_logits"], axis=-1).astype(jnp.int32)
            return carry + preds.sum(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (ids, seg, pos))
        return total

    _ = int(run_corpus(params, g_ids, g_seg, g_pos))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = int(run_corpus(params, g_ids, g_seg, g_pos))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return n_orig / best, fill_ratio, (nb2 * B) / best


def bench_train(layers, B, L, K, attention_impl, trunk="dense"):
    """Composite train-step throughput (windows/s trained), slope method.

    trunk="dense" is the BERT-base recipe at L=512; trunk="longformer" is
    the reference's flagship training recipe (run_finetune.sh:13-14:
    longformer_base, seq 2048) — sliding-window attention, window 512,
    roberta positions — engaging the fused sliding-window training kernel
    (ops/pallas/train_sliding.py) on TPU."""
    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, TrainConfig
    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from spokennlp_tpu.train import optim
    from spokennlp_tpu.train.train_step import (
        create_train_state,
        make_topic_seg_train_step,
    )

    if trunk == "longformer":
        enc = EncoderConfig(
            vocab_size=30522, hidden_size=768, num_layers=layers,
            num_heads=12, intermediate_size=3072,
            max_position_embeddings=L + 8, add_pooler=False,
            attention_type="sliding_window", attention_window=512,
            position_style="roberta", pad_token_id=1,
            attention_impl=attention_impl,
        )
    else:
        enc = EncoderConfig(
            vocab_size=30522, hidden_size=768, num_layers=layers, num_heads=12,
            intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
            attention_impl=attention_impl,
        )
    task = TopicSegConfig(cl_anchor_level="eop_matrix", do_tssp=True, do_da_ts=True)
    model = TopicSegModel(enc, task, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 30000, size=(B, 2, L)).astype(np.int32)),
        "attention_mask": jnp.ones((B, 2, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, 2, L), jnp.int32),
        "labels": jnp.asarray(rng.integers(-100, 2, size=(B, 2, L)).astype(np.int32)),
        "sent_positions": jnp.asarray(
            np.tile(np.arange(K)[None, None] * 7 + 1, (B, 2, 1)).astype(np.int32)
        ),
        "sent_mask": jnp.ones((B, 2, K), jnp.int32),
        "eop_mask": jnp.ones((B, 2, K), jnp.int32),
        "pair_orders": jnp.asarray(rng.integers(0, 3, size=(B, 2, K)).astype(np.int32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"][:, 0],
        attention_mask=batch["attention_mask"][:, 0],
        sent_positions=batch["sent_positions"][:, 0], deterministic=True,
    )["params"]
    tx = optim.make_optimizer(TrainConfig(gradient_accumulation_steps=1), total_steps=1000)
    state = create_train_state(params, tx)
    step = make_topic_seg_train_step(model, task, tx)

    @jax.jit
    def run(state, batch, iters):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = step(st, batch, sub)
            return (st, key)

        st, _ = jax.lax.fori_loop(0, iters, body, (state, jax.random.PRNGKey(1)))
        return st.params["classifier"]["bias"][0].astype(jnp.float32)

    _ = float(run(state, batch, 1))  # compile
    ts = {}
    for n in (2, 8):
        t0 = time.perf_counter()
        _ = float(run(state, batch, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[8] - ts[2]) / 6
    return B / per, per


def load_distill_evidence():
    path = os.path.join(REPO, "PARITY_DISTILL.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
    except Exception:
        return None
    # non-vacuity: the torch reference anchor must itself have learned
    # (an undertrained anchor would make the gate trivially passable)
    anchor_learned = d.get("torch_12l", {}).get("pk", 1.0) < 0.3
    if d.get("pass") and d.get("serving_depth") and anchor_learned:
        return d
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--num-batches", type=int, default=24)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--baseline", type=float, default=5000.0)
    ap.add_argument("--layers", type=int, default=None,
                    help="override serving depth (default: PARITY_DISTILL-"
                    "proven student depth if available, else 12)")
    ap.add_argument("--attention-impl", default="auto",
                    choices=["auto", "einsum", "flash", "pallas", "fused", "stack"])
    ap.add_argument(
        "--quantize", default="w8a8", choices=["none", "w8a8"],
        help="W8A8 Pallas projections (argmax-parity tested vs bf16; "
        "tests/test_int8_matmul.py)",
    )
    ap.add_argument("--packed", action="store_true",
                    help="bench the packed inference engine on ~85%%-fill windows")
    ap.add_argument("--train", action="store_true",
                    help="bench the composite train step (windows/s trained)")
    ap.add_argument("--train-batch", type=int, default=32)
    ap.add_argument("--train-trunk", default="dense",
                    choices=["dense", "longformer"],
                    help="longformer = the reference flagship training "
                    "recipe (sliding-window, seq 2048); pair with "
                    "--seq-len 2048 --train-batch 4")
    ap.add_argument("--no-distill", action="store_true",
                    help="ignore PARITY_DISTILL.json; bench 12 layers")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)

    B, L, NB = args.batch_size, args.seq_len, args.num_batches

    if args.train:
        K = 128 if args.train_trunk == "longformer" else 64
        wps, per = bench_train(
            args.layers or 12, args.train_batch, L, K, args.attention_impl,
            trunk=args.train_trunk)
        name = ("topic_seg_composite_train_windows_per_sec_per_chip"
                if args.train_trunk == "dense" else
                f"longformer_{L}_composite_train_windows_per_sec_per_chip")
        print(json.dumps({
            "metric": name,
            "value": round(wps, 1),
            "unit": "windows/s",
            "vs_baseline": None,
            "step_ms": round(per * 1e3, 1),
            "batch_windows": args.train_batch,
            "detail": "anchor+DA dual fwd + CSSL/TSSP composite loss + AdamW",
        }))
        return

    if args.packed:
        model = make_model(args.layers or 12, L, args.attention_impl, args.quantize)
        wps, fill, sps = bench_packed(model, B, L, NB, args.repeats)
        print(json.dumps({
            "metric": "topic_seg_512tok_windows_per_sec_per_chip_packed",
            "value": round(wps, 1),
            "unit": "windows/s",
            "vs_baseline": round(wps / args.baseline, 4),
            "fill_ratio": round(fill, 4),
            "packed_seqs_per_sec": round(sps, 1),
            "layers": args.layers or 12,
        }))
        return

    evidence = None if (args.no_distill or args.layers) else load_distill_evidence()
    layers = args.layers or (evidence["serving_depth"] if evidence else 12)

    # Equal-time corpus sizing: the timed call carries ONE ~29 ms tunnel
    # fetch regardless of corpus size, so a corpus sized for a 12-layer
    # model (NB=24 -> ~1.3 s/call, fetch <3%) under-reports a shallow
    # trunk 4-12x shorter per window (1L at NB=24: 162 ms/call, fetch
    # ~18%). Scale NB inversely with depth so every depth is measured
    # over >= ~1.3 s of work; chip-verified vs the slope method
    # (marginal 43.9 us/window = 22.8k w/s at 1L).
    if args.num_batches == 24 and layers < 12:
        NB = 24 * (12 // layers)

    model = make_model(layers, L, args.attention_impl, args.quantize)
    wps = bench_dense(model, B, L, NB, args.repeats)

    out = {
        "metric": "topic_seg_512tok_windows_per_sec_per_chip",
        "value": round(wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(wps / args.baseline, 4),
        "layers": layers,
    }
    if evidence and layers == evidence["serving_depth"]:
        # headline = the distilled serving trunk; 12L reported alongside
        # (at its own equal-time corpus size)
        model12 = make_model(12, L, args.attention_impl, args.quantize)
        wps12 = bench_dense(model12, B, L, min(NB, 24), args.repeats)
        depth_row = evidence["students"][str(layers)]
        out["model"] = f"distilled-{layers}L-bert-base (W8A8)"
        out["bert_base_12l_windows_per_sec"] = round(wps12, 1)
        out["quality_evidence"] = {
            "artifact": "PARITY_DISTILL.json",
            "abs_delta_pk_vs_torch_12l_reference":
                depth_row["abs_delta_vs_torch12"]["pk"],
            "abs_delta_wd_vs_torch_12l_reference":
                depth_row["abs_delta_vs_torch12"]["wd"],
            "gate": evidence["gate"],
        }
        # full-scale evidence (round-5): quality measured AT the benched
        # shape (hidden=768, seq=512, W8A8 serving path) instead of only
        # the h=64 harness — see scripts/distill.py stage emit_full
        full_path = os.path.join(REPO, "PARITY_DISTILL_FULL.json")
        if os.path.exists(full_path):
            try:
                with open(full_path) as f:
                    full = json.load(f)
                row = full["students_mean_std"].get(str(layers))
                if full.get("pass") and row:
                    out["quality_evidence_full_scale"] = {
                        "artifact": "PARITY_DISTILL_FULL.json",
                        "composed_delta_pk_mean":
                            row["composed_delta_vs_torch12_mean_std"]["pk"][0],
                        "composed_delta_wd_mean":
                            row["composed_delta_vs_torch12_mean_std"]["wd"][0],
                        "serving_path_within_gate":
                            row.get("serving_within_gate"),
                        "gate": full["gate"],
                    }
            except Exception:
                pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
