"""End-to-end smoke: featurize -> jit forward -> aggregate -> metrics.

Also exercises the multi-device mesh path on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig, WindowingConfig
from spokennlp_tpu.eval.inference import run_topic_seg_inference
from spokennlp_tpu.models.topic_seg import TopicSegModel, compute_topic_seg_loss
from spokennlp_tpu.parallel import mesh as mesh_lib


TINY_ENC = EncoderConfig(
    vocab_size=256,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    add_pooler=False,
)
TASK = TopicSegConfig()
WCFG = WindowingConfig(max_seq_length=32, cls_token_id=2, pad_token_id=0, bos_token_id=1)


def _random_docs(rng, n_docs=4):
    docs = []
    for _ in range(n_docs):
        n_sent = int(rng.integers(4, 12))
        docs.append(
            {
                "sent_token_ids": [
                    rng.integers(10, 255, size=rng.integers(2, 8)).tolist()
                    for _ in range(n_sent)
                ],
                "labels": rng.integers(0, 2, size=n_sent).tolist(),
            }
        )
    return docs


@pytest.fixture(scope="module")
def model_and_params():
    model = TopicSegModel(TINY_ENC, TASK)
    rng = jax.random.PRNGKey(0)
    B, L = 2, WCFG.max_seq_length
    params = model.init(
        rng,
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        sent_positions=jnp.zeros((B, 4), jnp.int32),
        deterministic=True,
    )["params"]
    return model, params


def test_inference_pipeline_runs(model_and_params):
    model, params = model_and_params
    docs = _random_docs(np.random.default_rng(0))
    out = run_topic_seg_inference(
        model, params, docs, WCFG, batch_size=4, threshold=0.5, topk=3
    )
    m = out["metrics"]
    assert 0.0 <= m["f1"] <= 1.0
    assert "threshold_0.5_example_level_1-pk" in m
    # every doc with >1 sentence yields predictions
    for doc, res in zip(docs, out["per_doc"]):
        assert len(res["labels"]) <= len(doc["labels"])
        assert res["scores"].shape[0] == len(res["labels"])


def test_gathered_engine_matches_full_logit_fetch(model_and_params):
    # the lt engine fetches logits gathered at sent_positions on device;
    # must equal aggregating the full (N, L, C) fetch
    from spokennlp_tpu.data import windowing as W
    from spokennlp_tpu.eval.inference import predict_windows_scanned

    model, params = model_and_params
    docs = _random_docs(np.random.default_rng(3))
    windows = []
    for eid, doc in enumerate(docs):
        windows.extend(
            W.window_document(doc["sent_token_ids"], doc["labels"], WCFG,
                              example_id=eid)
        )
    batch = W.stack_windows(windows)
    full = predict_windows_scanned(model, params, batch, 4)
    gathered = predict_windows_scanned(model, params, batch, 4,
                                       gather_sents=True)
    a = W.aggregate_window_predictions(
        batch["example_id"], batch["labels"], full, num_examples=len(docs)
    )
    b = W.aggregate_gathered_predictions(
        batch["example_id"], batch["sent_labels"], gathered,
        num_examples=len(docs)
    )
    assert len(a) == len(b)
    for da, db in zip(a, b):
        np.testing.assert_array_equal(da["labels"], db["labels"])
        np.testing.assert_allclose(da["scores"], db["scores"], atol=1e-6)


def test_training_loss_and_grads(model_and_params):
    """Composite loss (ts + matrix CSSL + DA ts + TSSP) differentiates."""
    model, params = model_and_params
    task = TopicSegConfig(cl_anchor_level="eop_matrix", do_tssp=True, do_da_ts=True)

    rng = np.random.default_rng(1)
    B, L, K = 2, WCFG.max_seq_length, 8
    batch = {
        "input_ids": rng.integers(3, 255, size=(B, 2, L)).astype(np.int32),
        "attention_mask": np.ones((B, 2, L), np.int32),
        "token_type_ids": np.zeros((B, 2, L), np.int32),
        "labels": np.full((B, 2, L), -100, np.int32),
        "sent_positions": np.zeros((B, 2, K), np.int32),
        "sent_mask": np.zeros((B, 2, K), np.int32),
        "eop_mask": np.zeros((B, 2, K), np.int32),
        "pair_orders": np.full((B, 2, K), -100, np.int32),
    }
    # plant sentences at positions 1, 5, 9, 13 with labels
    for b in range(B):
        for v in range(2):
            for k, pos in enumerate([1, 5, 9, 13]):
                batch["sent_positions"][b, v, k] = pos
                batch["sent_mask"][b, v, k] = 1
                lab = int(rng.integers(0, 2))
                if k < 3:  # last sentence masked like the featurizer does
                    batch["labels"][b, v, pos] = lab
                    batch["eop_mask"][b, v, k] = 1
                batch["pair_orders"][b, v, k] = int(rng.integers(0, 3))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p):
        anchor = model.apply(
            {"params": p},
            jb["input_ids"][:, 0],
            attention_mask=jb["attention_mask"][:, 0],
            token_type_ids=jb["token_type_ids"][:, 0],
            sent_positions=jb["sent_positions"][:, 0],
            deterministic=True,
        )
        da = model.apply(
            {"params": p},
            jb["input_ids"][:, 1],
            attention_mask=jb["attention_mask"][:, 1],
            token_type_ids=jb["token_type_ids"][:, 1],
            sent_positions=jb["sent_positions"][:, 1],
            deterministic=True,
        )
        loss, aux = compute_topic_seg_loss(task, anchor, da, jb)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # gradient actually flows into the encoder
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert gnorm > 0


def test_mesh_sharded_forward():
    """Forward under jit with dp=4 x tp=2 sharding on the virtual CPU mesh."""
    assert jax.device_count() == 8, "conftest should provide 8 virtual devices"
    model = TopicSegModel(TINY_ENC, TASK)
    B, L = 8, WCFG.max_seq_length
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        deterministic=True,
    )["params"]

    mesh = mesh_lib.make_mesh(model_parallel_size=2)
    sharded_params = mesh_lib.shard_params(params, mesh)
    bsh = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def fwd(p, ids, am):
        out = model.apply({"params": p}, ids, attention_mask=am, deterministic=True)
        return out["token_logits"]

    ids = jax.device_put(jnp.ones((B, L), jnp.int32), bsh)
    am = jax.device_put(jnp.ones((B, L), jnp.int32), bsh)
    logits = fwd(sharded_params, ids, am)
    assert logits.shape == (B, L, TASK.num_labels)

    # parity with unsharded execution
    ref = fwd(params, jnp.ones((B, L), jnp.int32), jnp.ones((B, L), jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)
