"""Optimizers and LR schedules (optax).

Replaces the reference's AdamW-with-warmup stacks (HF Trainer defaults,
TF AdamWeightDecay at action-item-detection/script/optimization.py, the noam
lambda at alimeeting4mug/src/topic_title_generation/palm_subtitle_generation.py:326)
with optax compositions.
"""

from __future__ import annotations

from typing import Optional

import optax

from spokennlp_tpu.configs import TrainConfig


def linear_warmup_schedule(
    base_lr: float, total_steps: int, warmup_steps: int = 0
) -> optax.Schedule:
    """HF Trainer default: linear warmup then linear decay to zero."""
    if warmup_steps > 0:
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup_steps),
                optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    return optax.linear_schedule(base_lr, 0.0, max(total_steps, 1))


def noam_schedule(model_size: int, factor: float, warmup_steps: int) -> optax.Schedule:
    """Noam LR (PALM 2.0 title generation recipe)."""

    def schedule(step):
        import jax.numpy as jnp

        step = step + 1
        # jnp.minimum: the schedule runs on a traced step inside jit
        return factor * model_size ** (-0.5) * jnp.minimum(
            step ** (-0.5), step * warmup_steps ** (-1.5)
        )

    return schedule


def make_optimizer(
    cfg: TrainConfig,
    total_steps: int,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping + optional gradient accumulation."""
    if schedule is None:
        warmup = int(cfg.warmup_ratio * total_steps)
        schedule = linear_warmup_schedule(cfg.learning_rate, total_steps, warmup)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def _decay_mask(params):
    """No weight decay on LayerNorm scales and biases (BERT convention)."""

    def mask_leaf(path, _):
        names = [getattr(k, "key", str(k)) for k in path]
        leaf = names[-1]
        if leaf in ("bias",) or "LayerNorm" in names or leaf == "scale":
            return False
        if any(n.endswith("_ln") for n in names):
            return False
        if "embedding" == leaf:  # embeddings do get decay in HF AdamW? They do.
            return True
        return True

    import jax

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_module_lr_optimizer(
    base_lr: float,
    module_lrs: dict,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Per-module learning-rate groups via optax.multi_transform.

    The reference builds torch param groups with a different LR for the
    cross-encoder (mmvts/src/main_multimodal.py:695-705:
    Adam([{base_params, lr}, {cross_encoder.parameters(), cross_encoder_lr}])).
    ``module_lrs`` maps a path substring (e.g. "cross_encoder") to its LR;
    params whose flattened path contains the substring join that group, the
    rest use ``base_lr``.
    """
    import jax

    names = sorted(module_lrs)

    def label_fn(params):
        def label(path, _):
            joined = "/".join(getattr(k, "key", str(k)) for k in path)
            for n in names:
                if n in joined:
                    return n
            return "__base__"

        return jax.tree_util.tree_map_with_path(label, params)

    def adam(lr):
        if weight_decay:
            return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
        return optax.adam(lr, b1=b1, b2=b2, eps=eps)

    transforms = {"__base__": adam(base_lr)}
    for n in names:
        transforms[n] = adam(module_lrs[n])
    return optax.multi_transform(transforms, label_fn)
