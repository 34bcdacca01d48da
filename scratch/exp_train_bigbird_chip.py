"""BigBird-2048 composite TRAIN-step throughput on one chip, fused
(train_bigbird.py custom-VJP kernel) vs einsum/block — the reference's
block-sparse long-context backbone (bigbird_for_ts.py) at the flagship
training length.

Usage: python scratch/exp_train_bigbird_chip.py [impl] [B]
  impl: train_fused | einsum (default both)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, TrainConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel
from spokennlp_tpu.train import optim
from spokennlp_tpu.train.train_step import create_train_state, make_topic_seg_train_step

impl_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
L, K = 2048, 128


def run(impl, B=B):
    enc = EncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=L + 8,
        add_pooler=False, attention_type="bigbird",
        bigbird_block_size=64, bigbird_num_global_blocks=2,
        bigbird_num_random_blocks=3, pad_token_id=0,
        attention_impl=impl,
        bigbird_impl="block" if impl == "einsum" else "auto",
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
            np.tile(np.arange(K)[None, None] * 15 + 1, (B, 2, 1)).astype(np.int32)
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
    def loop(state, batch, iters):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, m = step(st, batch, sub)
            return (st, key)

        st, _ = jax.lax.fori_loop(0, iters, body, (state, jax.random.PRNGKey(1)))
        return st.params["classifier"]["bias"][0].astype(jnp.float32)

    t0 = time.perf_counter()
    _ = float(loop(state, batch, 1))
    print(f"[{impl}] compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (2, 6):
        t0 = time.perf_counter()
        _ = float(loop(state, batch, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[6] - ts[2]) / 4
    print(
        f"[{impl}] L=2048 train step: {per*1e3:.1f} ms/step (B={B} x2 views) "
        f"-> {B/per:.1f} windows/s trained", flush=True,
    )
    return per


def run_fitting(impl):
    """Run at the requested B, halving on HBM OOM; returns (per_window_s, B)."""
    b = B
    while b >= 1:
        try:
            per = run(impl, b)
            return per / b, b
        except Exception as e:  # noqa: BLE001
            if "memory" in str(e).lower() or "hbm" in str(e).lower():
                print(f"[{impl}] B={b} OOM -> retry B={b//2}", flush=True)
                b //= 2
                continue
            raise
    raise RuntimeError(f"{impl} OOM even at B=1")


if impl_arg == "both":
    pw1, b1 = run_fitting("einsum")
    pw2, b2 = run_fitting("train_fused")
    print(
        f"einsum {1/pw1:.1f} w/s (B={b1}) vs fused {1/pw2:.1f} w/s (B={b2}) "
        f"-> speedup {pw1/pw2:.2f}x per window", flush=True,
    )
else:
    run_fitting(impl_arg)
