"""Shared fixture builder for the two-process sharded train-step test.

Everything here must be DETERMINISTIC across processes: both children and
the single-process reference build byte-identical params and batch, so the
only difference is how the work is laid out (1 process x 8 devices vs
2 processes x 4 devices over one jax.distributed world).
"""

import numpy as np

B, L, K = 8, 64, 8


def build_model():
    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, TrainConfig
    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from spokennlp_tpu.train import optim

    enc = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=L, add_pooler=False,
    )
    task = TopicSegConfig(cl_anchor_level="eop_matrix", do_tssp=True,
                          do_da_ts=True)
    model = TopicSegModel(enc, task)
    batch = build_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["input_ids"][:, 0]),
        attention_mask=jnp.asarray(batch["attention_mask"][:, 0]),
        sent_positions=jnp.asarray(batch["sent_positions"][:, 0]),
        deterministic=True,
    )["params"]
    tx = optim.make_optimizer(TrainConfig(gradient_accumulation_steps=1),
                              total_steps=10)
    return model, task, params, tx


def build_batch():
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(3, 511, size=(B, 2, L)).astype(np.int32),
        "attention_mask": np.ones((B, 2, L), np.int32),
        "token_type_ids": np.zeros((B, 2, L), np.int32),
        "labels": np.full((B, 2, L), -100, np.int32),
        "sent_positions": np.tile(
            (np.arange(K) * 7 + 1)[None, None], (B, 2, 1)).astype(np.int32),
        "sent_mask": np.ones((B, 2, K), np.int32),
        "eop_mask": np.ones((B, 2, K), np.int32),
        "pair_orders": rng.integers(0, 3, size=(B, 2, K)).astype(np.int32),
    }
    for b in range(B):
        for v in range(2):
            for k in range(K):
                batch["labels"][b, v, k * 7 + 1] = int(rng.integers(0, 2))
    return batch


def run_reference_single_process():
    """One dp step on however many local devices exist in THIS process."""
    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.train.train_step import (
        create_train_state,
        make_topic_seg_train_step,
    )

    model, task, params, tx = build_model()
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_topic_seg_train_step(model, task, tx)
    _, metrics = step(state, {k: jnp.asarray(v)
                              for k, v in build_batch().items()},
                      jax.random.PRNGKey(1))
    return float(metrics["loss"]), float(metrics["grad_norm"])


def run_two_process_member(process_id: int, coordinator: str):
    """Join the 2-process world (4 local devices each) and run the SAME dp
    step over the global 8-device mesh; returns (loss, grad_norm)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spokennlp_tpu.parallel import dist

    ok = dist.initialize_distributed(
        coordinator_address=coordinator, num_processes=2,
        process_id=process_id)
    assert ok and jax.process_count() == 2
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from spokennlp_tpu.train.train_step import (
        create_train_state,
        make_topic_seg_train_step,
    )

    model, task, params, tx = build_model()
    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))

    with mesh:
        g_params = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()),
            params,
        )
        local = {k: v[process_id * (B // 2) : (process_id + 1) * (B // 2)]
                 for k, v in build_batch().items()}
        g_batch = {
            k: multihost_utils.host_local_array_to_global_array(
                v, mesh, P("data"))
            for k, v in local.items()
        }
        state = create_train_state(g_params, tx)
        step = make_topic_seg_train_step(model, task, tx)
        state, metrics = step(state, g_batch, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        # the step's metric scalars may come back on a single device of the
        # global mesh (not addressable from the other process); re-commit to
        # a replicated sharding before fetching
        from jax.sharding import NamedSharding

        rep = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(mesh, P()))
        loss = float(np.asarray(rep(metrics["loss"]).addressable_data(0)))
        gnorm = float(np.asarray(rep(metrics["grad_norm"]).addressable_data(0)))
    return loss, gnorm
