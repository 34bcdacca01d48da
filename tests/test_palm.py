"""PALM 2.0 architecture + checkpoint-conversion tests.

Structural self-test pattern as tests/test_ponet_convert.py: random state
dict in the documented ModelScope palm_v2 layout -> torch functional forward
(OpenNMT TransformerDecoder + CopyGenerator semantics, models/palm.py
docstring) vs the converted Flax PalmModel. Plus copy-mechanism unit checks
and a decode smoke test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spokennlp_tpu.configs import EncoderConfig  # noqa: E402
from spokennlp_tpu.models import hf_convert  # noqa: E402
from spokennlp_tpu.models.palm import (  # noqa: E402
    PalmConfig,
    PalmModel,
    palm_beam_decode,
    palm_loss,
    sinusoidal_positions,
)

H, NH, DEC_LAYERS, ENC_LAYERS, INTER, VOCAB, MAXPOS = 32, 4, 2, 2, 64, 96, 64
HD = H // NH

ENC_CFG = EncoderConfig(
    vocab_size=VOCAB,
    hidden_size=H,
    num_layers=ENC_LAYERS,
    num_heads=NH,
    intermediate_size=INTER,
    max_position_embeddings=MAXPOS,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    add_pooler=False,
)
CFG = PalmConfig(
    vocab_size=VOCAB,
    hidden_size=H,
    num_decoder_layers=DEC_LAYERS,
    num_heads=NH,
    intermediate_size=INTER,
    max_target_length=16,
    dropout=0.0,
)


def _make_state_dict(rng):
    """Random palm_v2-layout state dict (encoder from a real HF BertModel)."""
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    bert = BertModel(
        BertConfig(
            vocab_size=VOCAB,
            hidden_size=H,
            num_hidden_layers=ENC_LAYERS,
            num_attention_heads=NH,
            intermediate_size=INTER,
            max_position_embeddings=MAXPOS,
        ),
        add_pooling_layer=False,
    ).eval()
    sd = {
        "palm.encoder." + k: v.detach().numpy()
        for k, v in bert.state_dict().items()
    }

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.normal(0, 0.08, size=(dout, din)).astype(
            np.float32
        )
        sd[name + ".bias"] = rng.normal(0, 0.02, size=(dout,)).astype(np.float32)

    def ln(name):
        sd[name + ".weight"] = rng.uniform(0.7, 1.3, size=(H,)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(0, 0.05, size=(H,)).astype(np.float32)

    sd["palm.decoder.embeddings.weight"] = rng.normal(
        0, 0.05, size=(VOCAB, H)
    ).astype(np.float32)
    for i in range(DEC_LAYERS):
        lp = f"palm.decoder.transformer_layers.{i}."
        for attn in ("self_attn", "context_attn"):
            for nm in ("linear_query", "linear_keys", "linear_values", "final_linear"):
                lin(lp + attn + "." + nm, H, H)
        ln(lp + "layer_norm_1")
        ln(lp + "layer_norm_2")
        ln(lp + "feed_forward.layer_norm")
        lin(lp + "feed_forward.w_1", H, INTER)
        lin(lp + "feed_forward.w_2", INTER, H)
    ln("palm.decoder.layer_norm")
    lin("generator.linear", H, VOCAB)
    lin("generator.linear_copy", H, 1)
    return sd, bert


def _t(sd, n):
    return torch.from_numpy(sd[n])


def _lin(x, sd, n):
    return F.linear(x, _t(sd, n + ".weight"), _t(sd, n + ".bias"))


def _ln(x, sd, n, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, n + ".weight"), _t(sd, n + ".bias"), eps)


def _mha(sd, lp, attn, q_in, kv, bias):
    q = _lin(q_in, sd, lp + attn + ".linear_query")
    k = _lin(kv, sd, lp + attn + ".linear_keys")
    v = _lin(kv, sd, lp + attn + ".linear_values")
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    q = q.view(B, Lq, NH, HD).transpose(1, 2)
    k = k.view(B, Lk, NH, HD).transpose(1, 2)
    v = v.view(B, Lk, NH, HD).transpose(1, 2)
    s = q @ k.transpose(-1, -2) / (HD**0.5) + bias
    p = s.softmax(-1)
    ctx = (p @ v).transpose(1, 2).reshape(B, Lq, H)
    return _lin(ctx, sd, lp + attn + ".final_linear"), p


def torch_palm_forward(sd, bert, src_ids, src_mask, tgt_ids):
    enc_out = bert(
        input_ids=src_ids, attention_mask=src_mask
    ).last_hidden_state
    B, Lt = tgt_ids.shape
    pe = torch.from_numpy(sinusoidal_positions(CFG.max_target_length, H)[:Lt])
    x = _t(sd, "palm.decoder.embeddings.weight")[tgt_ids] * (H**0.5) + pe[None]
    causal = torch.tril(torch.ones(Lt, Lt, dtype=torch.bool))
    self_bias = torch.where(causal, 0.0, -1e9)[None, None]
    cross_bias = (1.0 - src_mask.float())[:, None, None, :] * -1e9
    probs = None
    for i in range(DEC_LAYERS):
        lp = f"palm.decoder.transformer_layers.{i}."
        xn = _ln(x, sd, lp + "layer_norm_1")
        sa, _ = _mha(sd, lp, "self_attn", xn, xn, self_bias)
        q = x + sa
        qn = _ln(q, sd, lp + "layer_norm_2")
        ca, probs = _mha(sd, lp, "context_attn", qn, enc_out, cross_bias)
        m = q + ca
        fn = _ln(m, sd, lp + "feed_forward.layer_norm")
        x = m + _lin(F.gelu(_lin(fn, sd, lp + "feed_forward.w_1")), sd, lp + "feed_forward.w_2")
    h = _ln(x, sd, "palm.decoder.layer_norm")
    vocab_logits = _lin(h, sd, "generator.linear")
    p_copy = torch.sigmoid(_lin(h, sd, "generator.linear_copy"))
    p_vocab = vocab_logits.softmax(-1) * (1 - p_copy)
    attn = probs.mean(1) * src_mask[:, None, :].float()
    attn = attn / attn.sum(-1, keepdim=True).clamp(min=1e-9)
    copy = attn * p_copy
    p_final = p_vocab + torch.zeros_like(p_vocab).scatter_add(
        2, src_ids[:, None, :].expand(-1, Lt, -1), copy
    )
    return torch.log(p_final.clamp(min=1e-9))


def test_palm_conversion_structural_parity():
    rng = np.random.default_rng(0)
    sd, bert = _make_state_dict(rng)
    B, S, Lt = 2, 20, 8
    src = rng.integers(1, VOCAB, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 15:] = 0
    tgt = rng.integers(1, VOCAB, size=(B, Lt)).astype(np.int32)

    want = (
        torch_palm_forward(
            sd,
            bert,
            torch.from_numpy(src).long(),
            torch.from_numpy(mask).long(),
            torch.from_numpy(tgt).long(),
        )
        .detach()
        .numpy()
    )
    params = hf_convert.palm_to_params(sd, ENC_CFG, DEC_LAYERS)
    model = PalmModel(ENC_CFG, CFG)
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(src),
            jnp.asarray(mask),
            jnp.asarray(tgt),
            deterministic=True,
        )["log_probs"]
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_palm_copy_mass_goes_to_source_ids():
    """With the copy gate saturated open, next-token mass must sit only on
    ids that appear in the source (pointer-generator contract)."""
    rng = np.random.default_rng(1)
    sd, _ = _make_state_dict(rng)
    # saturate sigmoid(linear_copy) -> 1
    sd["generator.linear_copy.bias"][:] = 30.0
    params = hf_convert.palm_to_params(sd, ENC_CFG, DEC_LAYERS)
    model = PalmModel(ENC_CFG, CFG)
    B, S, Lt = 1, 6, 4
    src = np.asarray([[5, 9, 13, 13, 21, 2]], np.int32)
    mask = np.ones((B, S), np.int32)
    tgt = np.asarray([[1, 5, 9, 2]], np.int32)
    out = model.apply(
        {"params": params},
        jnp.asarray(src),
        jnp.asarray(mask),
        jnp.asarray(tgt),
        deterministic=True,
    )
    probs = np.exp(np.asarray(out["log_probs"]))[0]  # (Lt, V)
    in_src = np.zeros(VOCAB, bool)
    in_src[np.unique(src)] = True
    off_src_mass = probs[:, ~in_src].sum(-1)
    assert (off_src_mass < 1e-5).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_palm_loss_and_beam_decode_smoke():
    rng = np.random.default_rng(2)
    sd, _ = _make_state_dict(rng)
    params = hf_convert.palm_to_params(sd, ENC_CFG, DEC_LAYERS)
    model = PalmModel(ENC_CFG, CFG)
    B, S, Lt = 2, 12, 6
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, VOCAB, size=(B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(1, VOCAB, size=(B, Lt)), jnp.int32
        ),
        "labels": jnp.asarray(
            np.where(
                rng.random((B, Lt)) < 0.2, -100, rng.integers(1, VOCAB, size=(B, Lt))
            ),
            jnp.int32,
        ),
    }
    loss = float(palm_loss(model, params, batch))
    assert np.isfinite(loss) and loss > 0
    out = palm_beam_decode(
        model,
        params,
        batch["input_ids"],
        batch["attention_mask"],
        num_beams=2,
        max_len=8,
    )
    assert out.shape == (B, 8)
    assert (np.asarray(out[:, 0]) == CFG.bos_token_id).all()


def test_title_generation_cli_palm_arch(tmp_path):
    """Track-3 CLI end-to-end with --model_arch palm (train 1 epoch, beam
    decode, submission writing)."""
    import json
    import os

    from spokennlp_tpu.cli import run_title_generation

    def meeting(i):
        sents = [{"s": f"sentence {j} of meeting {i} . "} for j in range(6)]
        return {
            "meeting_key": f"M{i}",
            "sentences": sents,
            "topic_segment_ids": [
                {"id": 3, "candidate": [{"title": "first topic"}]},
                {"id": 6, "candidate": [{"title": "second topic"}]},
            ],
        }

    for name, n in (("train.jsonl", 4), ("dev.jsonl", 2)):
        with open(tmp_path / name, "w") as f:
            for i in range(n):
                f.write(json.dumps(meeting(i)) + "\n")
    res = run_title_generation.main([
        "--train_file", str(tmp_path / "train.jsonl"),
        "--eval_file", str(tmp_path / "dev.jsonl"),
        "--output_dir", str(tmp_path / "out"),
        "--model_arch", "palm",
        "--max_source_length", "64", "--max_target_length", "12",
        "--hidden_size", "16", "--num_hidden_layers", "1",
        "--num_decoder_layers", "1", "--num_attention_heads", "2",
        "--intermediate_size", "32", "--num_train_epochs", "1",
        "--per_device_train_batch_size", "2", "--num_beams", "2",
    ])
    assert "rouge1" in res["final"]
    assert os.path.exists(tmp_path / "out" / "track3_submission.json")


def test_palm_export_roundtrip():
    """hf_export.palm_params_to_sd is the exact inverse of palm_to_params:
    the re-exported state dict matches the source palm_v2 layout key-for-key
    (ModelScope Track-3 checkpoints round-trip losslessly)."""
    from spokennlp_tpu.models import hf_export

    rng = np.random.default_rng(1)
    sd, _ = _make_state_dict(rng)
    params = hf_convert.palm_to_params(sd, ENC_CFG, DEC_LAYERS)
    back = hf_export.palm_params_to_sd(params, ENC_CFG)
    missing = set(sd) - set(back)
    # position_ids is a torch buffer, not a weight; everything else must match
    missing = {k for k in missing if "position_ids" not in k}
    assert missing == set(), missing
    assert set(back) - set(sd) == set()
    for k in back:
        np.testing.assert_allclose(back[k], sd[k], atol=1e-6, err_msg=k)
