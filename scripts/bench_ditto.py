"""Ditto sentence-embedding throughput: sentences/sec/chip.

BASELINE.json tracks "Ditto sentences/sec + STS parity"; STS parity is
covered by tests/test_ditto.py (pooler oracle checks) — this script measures
the serving rate of the headline Ditto configuration (bert-base,
att_first_last pooler, attention diagonal from layer 0 / head 9, the
run_eval_ditto.sh:17 recipe) on the available chip.

Same measurement design as bench.py: the timed loop is ONE jitted lax.scan
over pre-staged batches (the tunnel's per-dispatch/fetch costs would swamp
per-batch timing), closed by a single scalar checksum fetch; compile is
excluded by a warmup call. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--num-batches", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=64,
                    help="STS sentences are short; 64 covers the 95th pct")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pooler", default="att_first_last")
    ap.add_argument("--layer", type=int, default=0)
    ap.add_argument("--head", type=int, default=9)
    ap.add_argument("--quantize", default="w8a8", choices=["none", "w8a8"])
    args = ap.parse_args()

    import sys

    sys.path.insert(0, "/root/repo")

    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.models.encoder import Encoder
    from spokennlp_tpu.projects.ditto import attention_diagonal

    enc_cfg = EncoderConfig(
        vocab_size=30522,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=512,
        add_pooler=False,
        softmax_in_compute_dtype=True,
        quantize=args.quantize,
    )
    encoder = Encoder(enc_cfg, dtype=jnp.bfloat16)

    B, L, NB = args.batch_size, args.seq_len, args.num_batches
    rng = np.random.default_rng(0)
    params = encoder.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        deterministic=True,
    )["params"]

    all_ids = jnp.asarray(rng.integers(1000, 30000, size=(NB, B, L)).astype(np.int32))
    # ragged sentence lengths: mask tails like real STS batches
    lens = rng.integers(L // 4, L + 1, size=(NB, B))
    all_mask = jnp.asarray(
        (np.arange(L)[None, None, :] < lens[..., None]).astype(np.int32)
    )

    layer, head = args.layer, args.head
    pooler = args.pooler

    @jax.jit
    def run_corpus(params, ids, mask):
        def body(carry, batch):
            bids, bmask = batch
            out = encoder.apply(
                {"params": params},
                bids,
                attention_mask=bmask,
                deterministic=True,
                output_hidden_states=True,
            )
            hs = out.hidden_states
            m = bmask[..., None].astype(out.last_hidden_state.dtype)
            if pooler == "att_first_last":
                diag = attention_diagonal(
                    encoder, params, hs[layer], bmask, layer, head
                )[..., None].astype(out.last_hidden_state.dtype)
                emb = ((hs[0] + hs[-1]) / 2.0 * m * diag).sum(1)
            elif pooler == "avg":
                emb = (out.last_hidden_state * m).sum(1) / m.sum(1)
            else:
                raise ValueError(pooler)
            return carry + emb.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ids, mask))
        return total

    _ = float(run_corpus(params, all_ids, all_mask))  # warmup / compile

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        _ = float(run_corpus(params, all_ids, all_mask))
        t1 = time.perf_counter()
        times.append(t1 - t0)
    best = min(times)

    sps = (NB * B) / best
    print(
        json.dumps(
            {
                "metric": "ditto_bert_base_sentences_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "sentences/s",
                "pooler": pooler,
                "seq_len": L,
                "batch_size": B,
            }
        )
    )


if __name__ == "__main__":
    main()
