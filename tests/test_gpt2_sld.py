"""GPT-2 parity, generation, and SLD loss/pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMModel,
    gpt2_hf_to_params,
    resize_token_embeddings,
)
from spokennlp_tpu.models.generation import beam_generate, greedy_generate
from spokennlp_tpu.projects import sld
from spokennlp_tpu.projects.sld_pipeline import (
    apply_kmeans,
    bpe_encode,
    dedupe_runs,
    learn_kmeans,
    train_bpe,
)
from spokennlp_tpu.eval.asr_metrics import cer, wer

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small_gpt2():
    hf_cfg = transformers.GPT2Config(
        vocab_size=200,
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=2,
        n_inner=64,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(
        vocab_size=200,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        embd_dropout=0.0,
        resid_dropout=0.0,
        attn_dropout=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = gpt2_hf_to_params(sd, cfg)
    return hf_cfg, model, cfg, params


def test_gpt2_logits_match_hf(small_gpt2):
    hf_cfg, torch_model, cfg, params = small_gpt2
    rng = np.random.default_rng(0)
    B, L = 2, 17
    ids = rng.integers(0, 200, size=(B, L))
    with torch.no_grad():
        want = torch_model(input_ids=torch.tensor(ids)).logits.numpy()
    model = GPT2LMModel(cfg)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32))["logits"]
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_cached_decode_matches_full_forward(small_gpt2):
    _, _, cfg, params = small_gpt2
    model = GPT2LMModel(cfg)
    rng = np.random.default_rng(1)
    B, P, T = 2, 6, 10
    prompt = rng.integers(0, 200, size=(B, P)).astype(np.int32)

    # greedy via cache
    seqs = greedy_generate(
        model, params, jnp.asarray(prompt), jnp.ones((B, P), jnp.int32),
        max_len=T, eos_id=199,
    )
    seqs = np.asarray(seqs)
    np.testing.assert_array_equal(seqs[:, :P], prompt)

    # step-by-step greedy via full forward (no cache) must agree until eos
    cur = prompt.copy()
    for t in range(P, T):
        logits = np.asarray(
            model.apply({"params": params}, jnp.asarray(cur, jnp.int32))["logits"]
        )
        nxt = logits[:, -1, :].argmax(-1)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    for b in range(B):
        for t in range(P, T):
            if 199 in seqs[b, P:t]:
                break  # post-eos positions repeat eos in the cached path
            assert seqs[b, t] == cur[b, t]


def test_beam_one_equals_greedy(small_gpt2):
    _, _, cfg, params = small_gpt2
    model = GPT2LMModel(cfg)
    rng = np.random.default_rng(2)
    B, P, T = 2, 5, 9
    prompt = jnp.asarray(rng.integers(0, 200, size=(B, P)), jnp.int32)
    am = jnp.ones((B, P), jnp.int32)
    g = np.asarray(greedy_generate(model, params, prompt, am, max_len=T, eos_id=199))
    b1 = np.asarray(
        beam_generate(model, params, prompt, am, max_len=T, eos_id=199, num_beams=1)
    )
    np.testing.assert_array_equal(g, b1)


def test_beam_finds_higher_likelihood(small_gpt2):
    _, _, cfg, params = small_gpt2
    model = GPT2LMModel(cfg)
    rng = np.random.default_rng(3)
    B, P, T = 2, 4, 12
    prompt = jnp.asarray(rng.integers(0, 200, size=(B, P)), jnp.int32)
    am = jnp.ones((B, P), jnp.int32)

    def seq_logprob(seq):
        logits = np.asarray(
            model.apply({"params": params}, jnp.asarray(seq[None], jnp.int32))["logits"]
        )[0]
        lp = 0.0
        for t in range(P - 1, T - 1):
            probs = np.exp(logits[t] - logits[t].max())
            probs /= probs.sum()
            lp += np.log(probs[seq[t + 1]])
        return lp

    g = np.asarray(greedy_generate(model, params, prompt, am, max_len=T, eos_id=9999))
    b4 = np.asarray(
        beam_generate(model, params, prompt, am, max_len=T, eos_id=9999, num_beams=4)
    )
    for i in range(B):
        assert seq_logprob(b4[i]) >= seq_logprob(g[i]) - 1e-4


# ------------------------------------------------------------------ SLD loss


def _torch_sld_loss(logits, labels, mask, cfg):
    """Oracle replicating the reference all_loss formula (:787-831)."""
    import torch.nn as nn

    logits = torch.tensor(logits)
    labels = torch.tensor(labels, dtype=torch.long)
    mask = torch.tensor(mask, dtype=torch.long)
    eps = 1e-9
    temperature = cfg.kl_temperature
    Vs = cfg.vocab_size_speech
    shift_logits = logits[:, :-1, -Vs:] * mask[:, :-1].unsqueeze(-1) + eps
    temp = (labels[:, 1:] - cfg.gpt_vocab_size - 2) * mask[:, 1:]
    temp = temp.clamp(min=0)
    one_hot = nn.functional.one_hot(temp, num_classes=Vs)
    shift_t = one_hot * (1 - cfg.label_smoothing_eps) + cfg.label_smoothing_eps / Vs
    shift_t = shift_t * mask[:, 1:].unsqueeze(-1) + eps
    kl = nn.KLDivLoss(reduction="batchmean")(
        nn.functional.log_softmax(shift_logits / temperature, dim=-1),
        nn.functional.softmax(shift_t / temperature, dim=-1),
    ) * temperature**2

    sl = logits[..., :-1, :].contiguous()
    sh = labels[..., 1:].contiguous()
    text_labels = torch.where(sh >= cfg.gpt_vocab_size + 1, -100, sh)
    speech_labels = torch.where(sh < cfg.gpt_vocab_size + 1, -100, sh)
    ce_text = nn.CrossEntropyLoss(ignore_index=-100)(
        sl.reshape(-1, sl.size(-1)), text_labels.reshape(-1)
    )
    ce_speech = nn.CrossEntropyLoss(ignore_index=-100)(
        sl.reshape(-1, sl.size(-1)), speech_labels.reshape(-1)
    )
    total = (
        cfg.weight_ce_speech * ce_speech
        + cfg.weight_ce_text * ce_text
        + cfg.weight_kl_speech * kl
    )
    return float(total), float(ce_speech), float(ce_text), float(kl)


def test_sld_loss_matches_reference_formula():
    cfg = sld.SLDConfig(
        gpt_vocab_size=20, vocab_size_speech=8, block_size=12, max_text_length=4,
        kl_temperature=2.0, eos_token_id=19,
    )
    rng = np.random.default_rng(0)
    B, L, V = 2, 12, cfg.total_vocab
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    packed = [
        sld.pack_example([1, 2, 3, 2], [5, 6, 7], cfg),
        sld.pack_example([4, 4, 1], [8, 9], cfg),
    ]
    labels = np.stack([p["labels"] for p in packed])
    mask = np.stack([p["attention_mask"] for p in packed])

    got, aux = sld.sld_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), cfg
    )
    want, w_sp, w_tx, w_kl = _torch_sld_loss(logits, labels, mask, cfg)
    assert float(aux["ce_speech"]) == pytest.approx(w_sp, abs=1e-4)
    assert float(aux["ce_text"]) == pytest.approx(w_tx, abs=1e-4)
    assert float(aux["kl_speech"]) == pytest.approx(w_kl, abs=1e-4)
    assert float(got) == pytest.approx(want, abs=3e-4)


def test_pack_example_layout():
    cfg = sld.SLDConfig(
        gpt_vocab_size=20, vocab_size_speech=8, block_size=12, max_text_length=4,
        eos_token_id=19,
    )
    p = sld.pack_example([0, 1], [5, 6, 7], cfg)
    # speech offset by 22; speech_end=21; text; text_end=20
    assert p["input_ids"][:7].tolist() == [22, 23, 21, 5, 6, 7, 20]
    assert p["attention_mask"].sum() == 7
    assert p["labels"][7] == -100
    # prompts end right after speech_end
    ids, mask = sld.build_prompts(p["input_ids"][None], cfg)
    assert ids[0, -1] == 21 and mask[0].sum() == 3
    # text extraction between markers
    toks = sld.extract_text_tokens(p["input_ids"][None], cfg)
    assert toks[0] == [5, 6, 7]


# --------------------------------------------------------------- wer / kmeans


def test_wer_cer():
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    assert cer(["abc"], ["adc"]) == pytest.approx(1 / 3)
    assert wer([""], ["a b"]) == 1.0


def test_kmeans_roundtrip():
    rng = np.random.default_rng(0)
    centers = np.asarray([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    feats = np.concatenate(
        [c + rng.normal(scale=0.1, size=(50, 2)) for c in centers]
    ).astype(np.float32)
    km = learn_kmeans(feats, n_clusters=3, seed=0, batch_size=32)
    toks = apply_kmeans(km, feats)
    # points from the same blob share a token
    assert len(set(toks[:50])) == 1
    assert len(set(toks[50:100])) == 1
    assert len({toks[0], toks[50], toks[100]}) == 3


def test_bpe_trainer_and_encode():
    corpus = ["1 2 3 1 2", "1 2 1 2", "3 3 1 2"]
    merges = train_bpe(corpus, vocab_size=6)
    assert ("1", "2") in merges  # most frequent pair merged
    enc = bpe_encode(["1", "2", "3"], merges)
    assert enc[0] == "1▁2"
    assert dedupe_runs([5, 5, 5, 2, 2, 7]) == [5, 2, 7]


def test_greedy_and_beam_flush_final_eos():
    """Regression: the while_loop body writes the PREVIOUS step's token, so
    when generation terminates (all rows finished), the token that finished
    the last row — the eos itself — used to be dropped, leaving the
    zero-initialized tail in its place (downstream extraction then read
    token id 0 as real content; caught by the SLD parity harness as a WER
    blow-up on otherwise-perfect models)."""
    import numpy as np

    from spokennlp_tpu.models.generation import beam_generate, greedy_generate

    cfg = GPT2Config(vocab_size=32, hidden_size=16, num_layers=1, num_heads=2,
                     intermediate_size=32, max_position_embeddings=32)
    model = GPT2LMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))[
        "params"
    ]
    ids = jnp.asarray(np.asarray([[5, 7, 9, 11]], np.int32))
    am = jnp.ones_like(ids)
    # find the token a random tiny model constantly argmaxes (eos_id=33 is
    # outside the vocab, so generation runs to max_len)
    free = np.asarray(
        greedy_generate(model, params, ids, am, max_len=12, eos_id=33)
    )
    c = int(free[0, 4])
    out = np.asarray(
        greedy_generate(model, params, ids, am, max_len=12, eos_id=c)
    )
    # the finishing token must be present in the output (pre-fix: slot 4
    # kept its zero initialization because the loop exited before writing)
    assert int(out[0, 4]) == c, out[0].tolist()
    bout = np.asarray(
        beam_generate(model, params, ids, am, max_len=12, eos_id=c,
                      num_beams=2)
    )
    assert c in bout[0, 4:].tolist(), bout[0].tolist()
