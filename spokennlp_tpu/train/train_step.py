"""Jitted train-step factory for topic segmentation (and friends).

One compiled SPMD program per model: forward (anchor + optional DA view),
composite loss, grad, optax update — all inside a single jit with
mesh shardings (data-parallel batch, optionally tensor-parallel params).
Gradient reduction is XLA's job (psum inserted from shardings); there is no
hand-written communication, unlike the reference's torch DDP
(reference: emnlp2023-topic_segmentation/run_finetune.sh:61).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from spokennlp_tpu.configs import TopicSegConfig
from spokennlp_tpu.models.topic_seg import compute_topic_seg_loss


@dataclasses.dataclass
class TrainState:
    """Minimal functional train state (a pytree)."""

    step: jax.Array
    params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def fast_dropout_key(step_rng):
    """Re-key the per-step dropout stream onto the counter-based RBG PRNG.

    Measured on v5e (scratch/exp_train_ablate.py): generating the step's
    dropout masks with the default threefry PRNG costs ~30% of the whole
    einsum train step (62 ms of 210 at BERT-base B=16 dual-view); the same
    step with the RBG impl is 147.5 ms. One tiny threefry draw here keeps
    step-to-step streams keyed off the caller's seed, then every mask in the
    step generates on the fast path. (The (L, L) attention-prob masks don't
    even reach this key on TPU — the train_fused kernels generate those on
    the in-kernel hardware PRNG.)
    """
    data = jax.random.bits(step_rng, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def make_topic_seg_train_step(
    model,
    task_cfg: TopicSegConfig,
    tx: optax.GradientTransformation,
    with_da: Optional[bool] = None,
) -> Callable:
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    ``batch`` layout: paired-view tensors of shape (B, 2, ...) —
    input_ids, attention_mask, token_type_ids, labels, sent_positions,
    sent_mask, eop_mask, pair_orders — plus optional cssl_* index tensors
    from data/cssl_sampling.py.
    """
    if with_da is None:
        with_da = task_cfg.do_da_ts or task_cfg.do_tssp

    def apply_view(params, batch, view: int, rng):
        return model.apply(
            {"params": params},
            batch["input_ids"][:, view],
            attention_mask=batch["attention_mask"][:, view],
            token_type_ids=batch["token_type_ids"][:, view],
            sent_positions=batch["sent_positions"][:, view],
            deterministic=False,
            rngs={"dropout": rng},
        )

    def loss_fn(params, batch, rng):
        rng_a, rng_d = jax.random.split(rng)
        anchor_out = apply_view(params, batch, 0, rng_a)
        da_out = apply_view(params, batch, 1, rng_d) if with_da else None
        cssl_indices = None
        if "cssl_anchor_indices" in batch:
            cssl_indices = {
                "anchor_indices": batch["cssl_anchor_indices"],
                "positive_indices": batch["cssl_positive_indices"],
                "negative_indices": batch["cssl_negative_indices"],
                "anchor_valid": batch["cssl_anchor_valid"],
            }
        loss, aux = compute_topic_seg_loss(
            task_cfg, anchor_out, da_out, batch, cssl_indices
        )
        scalars = {
            k: v for k, v in aux.items() if isinstance(v, jax.Array) and v.ndim == 0
        }
        return loss, scalars

    def train_step(state: TrainState, batch: Dict, rng) -> tuple:
        step_rng = fast_dropout_key(jax.random.fold_in(rng, state.step))
        (loss, scalars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(scalars)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
