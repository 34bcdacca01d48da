"""Flagship train-step ablations on chip: where do the 209 ms go?

Variants: baseline / no-dropout / rbg-prng / ce-only / fwd-only(+grad off).
Slope methodology (fori with rng chained on carry).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
import optax

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, TrainConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel, compute_topic_seg_loss
from spokennlp_tpu.train import optim
from spokennlp_tpu.train.train_step import create_train_state

B, L, K = 16, 512, 64
DET = "--det" in sys.argv
CE_ONLY = "--ce" in sys.argv
FWD_ONLY = "--fwd" in sys.argv
SINGLE_VIEW = "--single" in sys.argv

enc = EncoderConfig(
    vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
)
task = TopicSegConfig(
    cl_anchor_level="eop_matrix",
    do_tssp=not CE_ONLY,
    do_da_ts=True,
    cl_loss_weight=0.0 if CE_ONLY else 0.5,
    tssp_loss_weight=0.0 if CE_ONLY else 1.0,
)
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


def apply_view(params, batch, view, rng):
    return model.apply(
        {"params": params},
        batch["input_ids"][:, view],
        attention_mask=batch["attention_mask"][:, view],
        token_type_ids=batch["token_type_ids"][:, view],
        sent_positions=batch["sent_positions"][:, view],
        deterministic=DET,
        rngs=None if DET else {"dropout": rng},
    )


def loss_fn(params, batch, rng):
    r1, r2 = jax.random.split(rng)
    anchor_out = apply_view(params, batch, 0, r1)
    da_out = None if SINGLE_VIEW else apply_view(params, batch, 1, r2)
    loss, aux = compute_topic_seg_loss(task, anchor_out, da_out, batch, None)
    return loss, aux


def step_full(state, batch, rng):
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, batch, rng
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return create_train_state(new_params, tx)._replace_hack(state, new_opt), loss


def mk_run(fwd_only):
    @jax.jit
    def run(state, batch, iters):
        def body(i, carry):
            st, key, acc = carry
            key, sub = jax.random.split(key)
            if fwd_only:
                loss, _ = loss_fn(st.params, batch, sub)
                return (st, key, acc + loss.astype(jnp.float32))
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, batch, sub
            )
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            from spokennlp_tpu.train.train_step import TrainState

            return (
                TrainState(step=st.step + 1, params=new_params, opt_state=new_opt),
                key,
                acc + loss.astype(jnp.float32),
            )

        st, _, acc = jax.lax.fori_loop(
            0, iters, body, (state, jax.random.PRNGKey(1), jnp.zeros((), jnp.float32))
        )
        return acc

    return run


run = mk_run(FWD_ONLY)
t0 = time.perf_counter()
_ = float(run(state, batch, 1))
print(f"compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
ts = {}
for n in (2, 8):
    t0 = time.perf_counter()
    _ = float(run(state, batch, n))
    ts[n] = time.perf_counter() - t0
per = (ts[8] - ts[2]) / 6
tag = " ".join(
    t for t, on in (
        ("det", DET), ("ce-only", CE_ONLY), ("fwd-only", FWD_ONLY),
        ("single-view", SINGLE_VIEW),
        ("rbg", "--rbg" in sys.argv),
    ) if on
) or "baseline"
print(f"[{tag}] {per*1e3:.1f} ms/step -> {B/per:.1f} windows/s", flush=True)
