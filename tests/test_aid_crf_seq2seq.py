"""Tests: action-item detection, CRF, BERT-CRF keyphrase, seq2seq titles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.seq2seq import Seq2SeqConfig, Seq2SeqModel, greedy_decode, seq2seq_loss
from spokennlp_tpu.ops.crf import crf_log_likelihood, crf_viterbi_decode
from spokennlp_tpu.projects import action_item as AI
from spokennlp_tpu.projects.mug import keyphrase as KP

torch = pytest.importorskip("torch")

ENC = EncoderConfig(
    vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, max_position_embeddings=128,
    hidden_dropout=0.0, attention_dropout=0.0,
)


# ----------------------------------------------------------------------- AID


def _sents(labels):
    return [{"text": f"sent{i}", "label": l} for i, l in enumerate(labels)]


def test_pairing_r_drop_doubles():
    cfg = AI.AidConfig(drop_type="r-drop", noisy_type="remain")
    out = AI.build_paired_examples(_sents([0, 1, 0]), cfg, np.random.default_rng(0))
    assert len(out) == 6
    assert out[0]["sentence"] == out[1]["sentence"]
    assert out[0]["pair"] == out[1]["pair"]


def test_pairing_context_drop_fix():
    cfg = AI.AidConfig(drop_type="context-drop-fix", noisy_type="remain")
    out = AI.build_paired_examples(_sents([0, 0, 0]), cfg, np.random.default_rng(0))
    # second of each pair has no context
    for i in range(1, len(out), 2):
        assert out[i]["contexts"] == []


def test_pairing_noisy_update_and_skip():
    # sentence 0 has positive neighbor 1 -> label updated to 1
    cfg = AI.AidConfig(drop_type="none", noisy_type="update")
    out = AI.build_paired_examples(_sents([0, 1, 0]), cfg, np.random.default_rng(0))
    assert out[0]["label"] == 1  # updated from context
    cfg = AI.AidConfig(drop_type="none", noisy_type="skip")
    out = AI.build_paired_examples(_sents([0, 1, 0]), cfg, np.random.default_rng(0))
    # sentences 0 and 2 skipped (noisy), sentence 1 kept
    assert len(out) == 1 and out[0]["label"] == 1


def test_aid_symmetric_kl_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 2)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 0, 0])
    cfg = AI.AidConfig(drop_type="r-drop", kl_alpha=0.7)
    got, aux = AI.aid_loss(jnp.asarray(logits), jnp.asarray(labels), cfg)

    t = torch.tensor(logits)
    lp = torch.log_softmax(t, -1)
    ce = float(torch.nn.NLLLoss()(lp, torch.tensor(labels)))
    pair = t.reshape(-1, 2, 2)
    p1 = torch.softmax(pair[:, 0], -1)
    p2 = torch.softmax(pair[:, 1], -1)
    kl12 = (p1 * (p1.log() - p2.log())).sum(-1)
    kl21 = (p2 * (p2.log() - p1.log())).sum(-1)
    want = ce + 0.7 * float((kl12 + kl21).mean()) / 2
    assert float(got) == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize("head", ["cls", "sep", "token_avg", "token_max"])
def test_aid_model_heads(head):
    cfg = AI.AidConfig(classifier_input=head, max_seq_length=32, dropout_rate=0.0)
    model = AI.AidModel(ENC, cfg)
    ex = {"sentence": "do it tomorrow", "contexts": ["before", "after"], "label": 1}
    feat = AI.featurize_example(
        ex, lambda s: [10 + (ord(c) % 80) for c in s], cfg, cls_id=2, sep_id=3
    )
    batch = {k: jnp.asarray(v[None]) for k, v in feat.items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], batch["sep_position"],
    )["params"]
    logits = model.apply(
        {"params": params}, batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], batch["sep_position"],
    )
    assert logits.shape == (1, 2)
    assert np.all(np.isfinite(np.asarray(logits)))


# ----------------------------------------------------------------------- CRF


def test_crf_likelihood_normalized():
    """Sum of exp(loglik) over all tag paths == 1."""
    rng = np.random.default_rng(0)
    B, L, T = 1, 3, 2
    em = jnp.asarray(rng.normal(size=(B, L, T)).astype(np.float32))
    trans = jnp.asarray(rng.normal(size=(T, T)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    total = 0.0
    import itertools

    for path in itertools.product(range(T), repeat=L):
        tags = jnp.asarray(np.asarray(path)[None])
        ll = float(crf_log_likelihood(em, tags, mask, trans))
        total += np.exp(ll)
    assert total == pytest.approx(1.0, abs=1e-5)


def test_crf_viterbi_is_argmax_path():
    rng = np.random.default_rng(1)
    B, L, T = 2, 4, 3
    em = jnp.asarray(rng.normal(size=(B, L, T)).astype(np.float32))
    trans = jnp.asarray(rng.normal(size=(T, T)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    tags, score = crf_viterbi_decode(em, mask, trans)
    import itertools

    for b in range(B):
        best = max(
            itertools.product(range(T), repeat=L),
            key=lambda p: float(
                sum(em[b, i, p[i]] for i in range(L))
                + sum(trans[p[i], p[i + 1]] for i in range(L - 1))
            ),
        )
        assert tuple(np.asarray(tags[b])) == best


def test_crf_training_learns_transitions():
    """CRF should learn 'B never follows B' style constraints from data."""
    import optax

    rng = np.random.default_rng(2)
    B, L, T = 16, 8, 2
    # data: alternating tags 0,1,0,1...
    tags = np.tile(np.arange(L) % 2, (B, 1)).astype(np.int32)
    em = jnp.zeros((B, L, T))
    mask = jnp.ones((B, L), jnp.int32)
    trans = jnp.zeros((T, T))

    def loss_fn(trans):
        return -crf_log_likelihood(em, jnp.asarray(tags), mask, trans)

    tx = optax.adam(0.1)
    opt = tx.init(trans)
    for _ in range(50):
        g = jax.grad(loss_fn)(trans)
        upd, opt = tx.update(g, opt)
        trans = optax.apply_updates(trans, upd)
    # transition 0->1 and 1->0 should dominate 0->0 / 1->1
    assert float(trans[0, 1]) > float(trans[0, 0])
    assert float(trans[1, 0]) > float(trans[1, 1])


# ----------------------------------------------------------- keyphrase (BIO)


def test_bio_span_roundtrip():
    tokens = list("我们讨论会议纪要然后散会")
    tags = KP.bio_tags_from_keyphrases(tokens, [list("会议纪要")])
    spans = KP.spans_from_bio(tags, [1] * len(tokens))
    assert spans == [(4, 8)]
    kps = KP.extract_keyphrases([tokens], [tags], [[1] * len(tokens)])
    assert kps == ["会议纪要"]


def test_bert_crf_tagger_end_to_end():
    model = KP.BertCrfTagger(ENC)
    B, L = 2, 16
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(5, 120, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    tags = jnp.asarray(rng.integers(0, 3, size=(B, L)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tags=tags)["params"]
    out = model.apply({"params": params}, ids, mask, tags=tags)
    assert np.isfinite(float(out["loss"]))
    decoded = KP.decode_tags(model, params, np.asarray(ids), np.asarray(mask))
    assert decoded.shape == (B, L)


# -------------------------------------------------------------------- seq2seq


def test_seq2seq_overfits_copy_task():
    """Decoder learns to emit a fixed title for a fixed input."""
    import optax

    cfg = Seq2SeqConfig(
        vocab_size=64, hidden_size=32, num_decoder_layers=1, num_heads=2,
        intermediate_size=64, max_target_length=8, dropout=0.0,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    model = Seq2SeqModel(ENC, cfg)
    B, Ls, Lt = 4, 10, 6
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(5, 120, size=(B, Ls)), jnp.int32)
    src_mask = jnp.ones((B, Ls), jnp.int32)
    target = np.asarray([[7, 8, 9, 2, 0, 0]] * B, np.int32)  # title + eos + pad
    dec_in = np.concatenate([np.full((B, 1), 1, np.int32), target[:, :-1]], axis=1)
    labels = np.where(target == 0, -100, target)
    batch = {
        "input_ids": src,
        "attention_mask": src_mask,
        "decoder_input_ids": jnp.asarray(dec_in),
        "decoder_attention_mask": jnp.asarray((dec_in != 0).astype(np.int32)),
        "labels": jnp.asarray(labels),
    }
    params = model.init(
        jax.random.PRNGKey(0), src, src_mask, batch["decoder_input_ids"]
    )["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: seq2seq_loss(model, p, batch)
        )(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(60):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.1

    decoded = np.asarray(greedy_decode(model, params, src, src_mask, max_len=6))
    np.testing.assert_array_equal(decoded[:, 1:4], target[:, :3])
