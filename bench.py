"""North-star benchmark: topic-seg inference throughput, 512-token windows/sec/chip.

Runs the flagship model (BERT-base topic-segmentation, bf16) over synthetic
512-token windows on the available chip and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N / 5000}

Measurement design for this environment: the TPU is reached through a tunnel
where every dispatch costs ~6-7 ms and a value fetch ~30 ms, and
block_until_ready does not actually synchronize — so the whole timed loop
runs ON DEVICE as one jitted lax.scan over pre-staged batches, and a single
scalar checksum fetch closes the timing. Compile is excluded by a warmup
call; the one-off fetch latency is amortized over thousands of windows.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--num-batches", type=int, default=24)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--baseline", type=float, default=5000.0)
    ap.add_argument("--attention-impl", default="auto", choices=["auto", "einsum", "flash", "pallas", "fused", "stack"])
    ap.add_argument(
        "--quantize", default="w8a8", choices=["none", "w8a8"],
        help="W8A8 Pallas projections (argmax-parity tested vs bf16; "
        "tests/test_int8_matmul.py)",
    )
    args = ap.parse_args()

    import sys

    sys.path.insert(0, "/root/repo")

    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
    from spokennlp_tpu.models.topic_seg import TopicSegModel

    enc = EncoderConfig(
        vocab_size=30522,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=args.seq_len,
        add_pooler=False,
        attention_impl=args.attention_impl,
        # bf16 softmax: 32% faster attention, argmax-stable for inference
        softmax_in_compute_dtype=True,
        quantize=args.quantize,
    )
    model = TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)

    B, L, NB = args.batch_size, args.seq_len, args.num_batches
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        deterministic=True,
    )["params"]

    # pre-staged corpus of windows on device: (NB, B, L)
    all_ids = jnp.asarray(rng.integers(1000, 30000, size=(NB, B, L)).astype(np.int32))
    all_mask = jnp.ones((NB, B, L), jnp.int32)

    @jax.jit
    def run_corpus(params, ids, mask):
        def body(carry, batch):
            bids, bmask = batch
            out = model.apply(
                {"params": params}, bids, attention_mask=bmask, deterministic=True
            )
            logits = out["token_logits"]
            # boundary decisions contribute to a checksum so nothing is DCE'd
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return carry + preds.sum(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (ids, mask))
        return total

    # warmup / compile
    _ = int(run_corpus(params, all_ids, all_mask))

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        checksum = int(run_corpus(params, all_ids, all_mask))
        t1 = time.perf_counter()
        times.append(t1 - t0)
    best = min(times)

    wps = (NB * B) / best
    print(
        json.dumps(
            {
                "metric": "topic_seg_512tok_windows_per_sec_per_chip",
                "value": round(wps, 1),
                "unit": "windows/s",
                "vs_baseline": round(wps / args.baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
