"""Ditto parity: diagonal-attention pooling vs HF torch reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.models import hf_convert
from spokennlp_tpu.projects import ditto

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def bert():
    hf_cfg = transformers.BertConfig(
        vocab_size=300,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
    )
    torch.manual_seed(1)
    model = transformers.BertModel(hf_cfg).eval()
    cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(model.state_dict())
    params = hf_convert.bert_to_encoder_params(sd, cfg)
    return hf_cfg, model, cfg, params


def _torch_pooled(model, input_ids, attention_mask, pooler, layer, head):
    """The reference batcher's pooling logic (ditto/evaluation_ditto.py:120-172)."""
    with torch.no_grad():
        outputs = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
            output_attentions=True,
            return_dict=True,
        )
    last_hidden = outputs.last_hidden_state
    hidden_states = outputs.hidden_states
    attention = outputs.attentions
    am = torch.tensor(attention_mask)
    attention_diag = torch.diagonal(
        attention[layer][:, head, :, :], 0, dim1=1, dim2=2
    )
    if pooler == "att_first_last":
        h = (hidden_states[0] + hidden_states[-1]) / 2.0
        return (h * am.unsqueeze(-1) * attention_diag.unsqueeze(-1)).sum(1).numpy()
    if pooler == "att_last":
        return (
            (last_hidden * am.unsqueeze(-1) * attention_diag.unsqueeze(-1)).sum(1).numpy()
        )
    if pooler == "avg":
        return ((last_hidden * am.unsqueeze(-1)).sum(1) / am.sum(-1).unsqueeze(-1)).numpy()
    if pooler == "avg_first_last":
        h = (hidden_states[0] + hidden_states[-1]) / 2.0
        return ((h * am.unsqueeze(-1)).sum(1) / am.sum(-1).unsqueeze(-1)).numpy()
    if pooler == "cls_before_pooler":
        return last_hidden[:, 0].numpy()
    if pooler == "cls":
        return outputs.pooler_output.numpy()
    raise ValueError(pooler)


@pytest.mark.parametrize(
    "pooler", ["att_first_last", "att_last", "avg", "avg_first_last", "cls", "cls_before_pooler"]
)
def test_pooler_parity(bert, pooler):
    hf_cfg, model, cfg, params = bert
    rng = np.random.default_rng(0)
    B, L = 3, 12
    input_ids = rng.integers(5, 299, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    attention_mask[2, 9:] = 0

    layer, head = 1, 2
    want = _torch_pooled(model, input_ids, attention_mask, pooler, layer, head)

    enc = Encoder(cfg)
    embed = ditto.make_embed_fn(enc, params, pooler=pooler, layer=layer, head=head)
    got = np.asarray(embed(jnp.asarray(input_ids, jnp.int32), jnp.asarray(attention_mask, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_sts_pipeline_runs(bert, tmp_path):
    _, _, cfg, params = bert
    enc = Encoder(cfg)
    embed = ditto.make_embed_fn(enc, params, pooler="att_first_last", layer=0, head=0)

    # toy vocabulary tokenizer: word -> hash bucket
    def tokenize(sentences):
        L = 16
        ids = np.zeros((len(sentences), L), np.int32)
        mask = np.zeros((len(sentences), L), np.int32)
        for i, s in enumerate(sentences):
            toks = [101] + [5 + (hash(w) % 290) for w in s.split()][: L - 1]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    tsv = tmp_path / "sts.tsv"
    lines = [
        "the cat sat\tthe cat sat\t5.0",
        "a dog runs\tthe cat sat\t1.0",
        "hello world\thello world again\t4.0",
        "alpha beta\tgamma delta\t0.5",
    ]
    tsv.write_text("\n".join(lines))
    ds = ditto.load_sts_tsv(str(tsv))
    res = ditto.evaluate_sts(embed, tokenize, ds, batch_size=2)
    assert "all_spearman" in res
    assert -1.0 <= res["all_spearman"] <= 1.0
    # identical sentences should embed identically -> top similarity
    emb = ditto._embed_corpus(embed, tokenize, ["same sentence", "same sentence"], 2)
    sims = ditto.cosine_scores(emb[0:1], emb[1:2])
    assert sims[0] == pytest.approx(1.0, abs=1e-5)
