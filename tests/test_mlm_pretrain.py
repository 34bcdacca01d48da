"""MLM+NSP further-pretraining (objectives/mlm.py + cli/run_pretrain_mlm).

Masking-walk semantics vs the reference's create_pretraining_data.py rules,
loss learnability, and the CLI end-to-end incl. reloading the saved trunk
through run_finetune's --model_name_or_path path.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.objectives.mlm import (
    BertForPreTraining,
    PretrainDataConfig,
    build_pretraining_batch,
    create_masked_lm_predictions,
    pretraining_loss,
)
from spokennlp_tpu.configs import EncoderConfig

DCFG = PretrainDataConfig(cls_token_id=2, sep_token_id=3, pad_token_id=0,
                          mask_token_id=4)


def test_masking_walk_semantics():
    rng = np.random.default_rng(0)
    ids = [2] + list(range(10, 50)) + [3]  # CLS + 40 tokens + SEP
    masked, pos, labels = create_masked_lm_predictions(
        ids, (0, 2, 3), vocab_size=100, rng=rng, mask_token_id=4,
        masked_lm_prob=0.15, max_predictions_per_seq=20,
    )
    # 15% of 42 rounds to 6 predictions
    assert len(pos) == 6 and len(labels) == 6
    assert pos == sorted(pos)
    for p, lab in zip(pos, labels):
        assert ids[p] == lab  # label = ORIGINAL token
        assert p not in (0, len(ids) - 1)  # specials never masked
    # over many draws the 80/10/10 rule holds roughly
    n_mask = n_keep = n_rand = 0
    for seed in range(200):
        r = np.random.default_rng(seed)
        m, p, l = create_masked_lm_predictions(
            ids, (0, 2, 3), 100, r, 4, 0.15, 20
        )
        for pi, li in zip(p, l):
            if m[pi] == 4:
                n_mask += 1
            elif m[pi] == li:
                n_keep += 1
            else:
                n_rand += 1
    tot = n_mask + n_keep + n_rand
    assert 0.72 < n_mask / tot < 0.88
    assert 0.05 < n_keep / tot < 0.16
    # random replacement can coincide with the original token, so the
    # observed "rand" bucket sits slightly under 10%
    assert 0.04 < n_rand / tot < 0.16


def test_whole_word_masking_groups_subwords():
    rng = np.random.default_rng(1)
    ids = [2, 10, 11, 12, 20, 21, 30, 3]
    flags = [False, False, True, True, False, True, False, False]
    for seed in range(30):
        r = np.random.default_rng(seed)
        _, pos, _ = create_masked_lm_predictions(
            ids, (0, 2, 3), 100, r, 4, 0.5, 20, subword_flags=flags
        )
        pos = set(pos)
        # word groups: {1,2,3}, {4,5}, {6} — all-or-nothing
        for group in ({1, 2, 3}, {4, 5}):
            assert pos & group in (set(), group)


def test_build_batch_shapes_and_nsp():
    rng = np.random.default_rng(2)
    docs = [
        [list(rng.integers(10, 90, size=rng.integers(4, 9))) for _ in range(5)]
        for _ in range(6)
    ]
    batch = build_pretraining_batch(docs, DCFG, rng, max_seq_length=48,
                                    max_predictions_per_seq=8, vocab_size=100)
    n = batch["input_ids"].shape[0]
    assert n == 6 * 4  # pairs of consecutive sentences
    assert batch["mlm_positions"].shape == (n, 8)
    assert set(np.unique(batch["nsp_labels"])) <= {0, 1}
    assert 0 < batch["nsp_labels"].mean() < 1  # both classes present
    # masked positions carry labels only where weights = 1
    w = batch["mlm_weights"]
    assert ((batch["mlm_labels"] > 0) <= (w > 0)).all()


def test_pretraining_loss_learns():
    """A tiny trunk overfits the MLM+NSP objective on a fixed batch."""
    import optax

    rng = np.random.default_rng(3)
    docs = [
        [list(rng.integers(10, 40, size=6)) for _ in range(4)] for _ in range(4)
    ]
    batch_np = build_pretraining_batch(docs, DCFG, rng, max_seq_length=32,
                                       max_predictions_per_seq=4,
                                       vocab_size=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    enc = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64, add_pooler=True,
                        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertForPreTraining(enc)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], batch["token_type_ids"],
                        batch["mlm_positions"])["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["input_ids"],
                              batch["attention_mask"], batch["token_type_ids"],
                              batch["mlm_positions"])
            return pretraining_loss(out, batch)

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::20]


def test_pretrain_cli_and_reload(tmp_path):
    """run_pretrain_mlm e2e on a toy corpus; the saved trunk loads through
    run_finetune's --model_name_or_path (the further-pretraining recipe)."""
    from spokennlp_tpu.cli import run_pretrain_mlm

    rng = np.random.default_rng(4)
    with open(tmp_path / "meetings.jsonl", "w") as f:
        for i in range(4):
            sents = [{"text": " ".join(f"word{int(w)}" for w in
                                       rng.integers(0, 30, size=6))}
                     for _ in range(5)]
            f.write(json.dumps({"meeting": f"M{i}", "sentences": sents}) + "\n")
    res = run_pretrain_mlm.main([
        "--train_file", str(tmp_path / "meetings.jsonl"),
        "--output_dir", str(tmp_path / "out"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--intermediate_size", "64",
        "--max_seq_length", "48", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "4",
    ])
    assert np.isfinite(res["final"]["loss"])
    ckpt = tmp_path / "out" / "pretrained_model"
    assert os.path.isdir(ckpt)

    from spokennlp_tpu.models import checkpoint_io

    params, cfg = checkpoint_io.load_checkpoint(str(ckpt))
    assert "embeddings" in params and cfg is not None
    # loads via the shared pretrained-resolution path (graftable trunk)
    from spokennlp_tpu.cli import common
    import argparse

    args = argparse.Namespace(model_name_or_path=str(ckpt))
    out = common.maybe_load_pretrained(args, cfg)
    assert out is not None
    cfg2, trunk = out
    assert "encoder" not in trunk  # bare trunk -> task CLIs graft it


def test_pretraining_heads_match_hf_torch():
    """Exact numeric parity of the MLM+NSP heads vs transformers'
    BertForPreTraining at converted weights: same inputs, same gathered
    positions -> prediction/seq-relationship logits and the composite loss
    must agree (the trunk itself is covered by tests/test_hf_parity.py;
    this pins the transform/LN/tied-decoder/NSP mapping in
    hf_convert.bert_pretraining_to_params)."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from spokennlp_tpu.models import hf_convert

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(0)
    hf = transformers.BertForPreTraining(hf_cfg).eval()
    sd = hf_convert.torch_state_dict_to_numpy(hf.state_dict())
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, add_pooler=True,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = hf_convert.bert_pretraining_to_params(sd, cfg)

    rng = np.random.default_rng(7)
    B, L, P = 3, 24, 5
    input_ids = rng.integers(5, 128, size=(B, L))
    token_type_ids = np.zeros((B, L), np.int32)
    attention_mask = np.ones((B, L), np.int32)
    attention_mask[1, 18:] = 0
    mlm_positions = np.stack([np.sort(rng.choice(np.arange(1, 17), P, replace=False))
                              for _ in range(B)])
    mlm_labels = rng.integers(5, 128, size=(B, P))
    mlm_weights = np.ones((B, P), np.float32)
    mlm_weights[:, -1] = 0.0  # a padded prediction slot
    nsp_labels = rng.integers(0, 2, size=(B,))

    with torch.no_grad():
        out_t = hf(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            token_type_ids=torch.tensor(token_type_ids),
        )
    # gather the same positions from the full-vocab prediction logits
    pred_t = out_t.prediction_logits.numpy()  # (B, L, V)
    mlm_t = np.take_along_axis(pred_t, mlm_positions[..., None], axis=1)
    nsp_t = out_t.seq_relationship_logits.numpy()

    model = BertForPreTraining(cfg)
    out_j = model.apply(
        {"params": params}, jnp.asarray(input_ids),
        jnp.asarray(attention_mask), jnp.asarray(token_type_ids),
        jnp.asarray(mlm_positions),
    )
    np.testing.assert_allclose(np.asarray(out_j["mlm_logits"]), mlm_t,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["nsp_logits"]), nsp_t,
                               atol=5e-4, rtol=1e-3)

    batch = {
        "mlm_labels": jnp.asarray(mlm_labels),
        "mlm_weights": jnp.asarray(mlm_weights),
        "nsp_labels": jnp.asarray(nsp_labels),
    }
    loss_j, aux = pretraining_loss(out_j, batch)
    # same composite on the torch logits (run_pretraining.py:148 semantics)
    lp = torch.log_softmax(torch.tensor(mlm_t), -1).numpy()
    lm = -np.take_along_axis(lp, mlm_labels[..., None], -1)[..., 0]
    mlm_ref = (lm * mlm_weights).sum() / mlm_weights.sum()
    nlp = torch.log_softmax(torch.tensor(nsp_t), -1).numpy()
    nsp_ref = -np.take_along_axis(nlp, nsp_labels[:, None], -1).mean()
    np.testing.assert_allclose(float(loss_j), mlm_ref + nsp_ref, atol=1e-4)
    np.testing.assert_allclose(float(aux["mlm_loss"]), mlm_ref, atol=1e-4)
