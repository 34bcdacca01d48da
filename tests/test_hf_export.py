"""ModelScope/HF-format checkpoint export (models/hf_export.py).

The reference ships every fine-tuned model via ``save_pretrained``
(alimeeting4mug/src/models/trainer.py:33-60); this suite proves our
exported dirs are (a) an exact inverse of hf_convert (round-trip to the
same param tree), (b) loadable by ``transformers.from_pretrained`` with no
missing/unexpected keys, and (c) numerically identical when the torch side
re-runs the exported weights.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models import hf_convert, hf_export
from spokennlp_tpu.models.encoder import Encoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tree_allclose(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_allclose(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-6, err_msg=path + "/" + str(k)
            )


def _init_encoder(cfg, seed=0, with_globals=False):
    enc = Encoder(cfg)
    B, L = 2, 16
    kwargs = {}
    if with_globals:  # materialize Longformer's qkv_global projections
        kwargs["global_attention_mask"] = (
            jnp.zeros((B, L), jnp.int32).at[:, 0].set(1)
        )
    variables = enc.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        **kwargs,
    )
    return variables["params"]


def test_bert_roundtrip():
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, add_pooler=True,
    )
    params = _init_encoder(cfg)
    sd = hf_export.encoder_params_to_bert_sd(params, cfg, prefix="bert.")
    back = hf_convert.bert_to_encoder_params(sd, cfg, prefix="bert.")
    _tree_allclose(params, back)


def test_longformer_roundtrip_with_globals():
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        attention_type="sliding_window", attention_window=8,
        position_style="roberta", add_pooler=False,
    )
    params = _init_encoder(cfg, with_globals=True)
    assert "qkv_global" in params["layer_0"]["attention"]
    sd = hf_export.encoder_params_to_bert_sd(params, cfg, prefix="longformer.")
    assert "longformer.encoder.layer.0.attention.self.query_global.weight" in sd
    back = hf_convert.longformer_to_encoder_params(sd, cfg, prefix="longformer.")
    _tree_allclose(params, back)


def test_ponet_roundtrip():
    from spokennlp_tpu.models.ponet import PoNetEncoder

    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        attention_type="ponet", ponet_ga_per_head=True, add_pooler=True,
    )
    enc = PoNetEncoder(cfg)
    B, L = 2, 16
    params = enc.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
    )["params"]
    sd = hf_export.encoder_params_to_ponet_sd(params, cfg)
    back = hf_convert.ponet_to_encoder_params(sd, cfg)
    _tree_allclose(params, back)


def test_task_tree_heads_exported():
    from spokennlp_tpu.models.topic_seg import TopicSegModel

    enc_cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, add_pooler=False,
    )
    task_cfg = TopicSegConfig()
    model = TopicSegModel(enc_cfg, task_cfg)
    B, L = 2, 16
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        sent_positions=jnp.zeros((B, 4), jnp.int32),
    )["params"]
    sd = hf_export.task_params_to_sd(params, enc_cfg)
    assert "classifier.weight" in sd and "classifier.bias" in sd
    assert "tssp_classifier.weight" in sd
    assert sd["classifier.weight"].shape == (task_cfg.num_labels, enc_cfg.hidden_size)
    # trunk nested under bert. as in the reference task models (bert_for_ts.py:25)
    assert "bert.embeddings.word_embeddings.weight" in sd


def test_from_pretrained_consumes_export(tmp_path):
    """transformers loads the exported dir with zero missing/unexpected keys
    and reproduces the JAX trunk's hidden states."""
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, add_pooler=True,
        hidden_act="gelu",
    )
    params = _init_encoder(cfg)
    out = str(tmp_path / "export")
    hf_export.save_hf_checkpoint(out, params, cfg, architectures=["BertModel"])
    assert os.path.exists(os.path.join(out, "pytorch_model.bin"))

    model, info = transformers.BertModel.from_pretrained(
        out, output_loading_info=True
    )
    missing = [k for k in info["missing_keys"] if "position_ids" not in k]
    assert missing == [], missing
    assert info["unexpected_keys"] == [], info["unexpected_keys"]

    rng = np.random.default_rng(0)
    B, L = 2, 12
    input_ids = rng.integers(0, cfg.vocab_size, size=(B, L))
    mask = np.ones((B, L), dtype=np.int64)
    model = model.eval()
    with torch.no_grad():
        t_out = model(
            input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    enc = Encoder(cfg)
    j_out = enc.apply(
        {"params": params},
        jnp.asarray(input_ids),
        attention_mask=jnp.asarray(mask),
    ).last_hidden_state
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4)


def test_tokenizer_files_copied(tmp_path):
    src = tmp_path / "tok"
    src.mkdir()
    (src / "vocab.txt").write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\n")
    (src / "tokenizer_config.json").write_text("{}")
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, add_pooler=False,
    )
    params = _init_encoder(cfg)
    out = str(tmp_path / "export")
    hf_export.save_hf_checkpoint(out, params, cfg, tokenizer_src=str(src))
    assert os.path.exists(os.path.join(out, "vocab.txt"))
    assert os.path.exists(os.path.join(out, "tokenizer_config.json"))


def test_config_json_roundtrip(tmp_path):
    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        attention_type="sliding_window", attention_window=8,
        position_style="roberta", pad_token_id=1, add_pooler=False,
    )
    params = _init_encoder(cfg)
    out = str(tmp_path / "export")
    hf_export.save_hf_checkpoint(out, params, cfg)
    hf_cfg = transformers.AutoConfig.from_pretrained(out)
    assert hf_cfg.model_type == "longformer"
    back = hf_convert.hf_longformer_config_to_encoder_config(hf_cfg)
    assert back.attention_window == cfg.attention_window
    assert back.hidden_size == cfg.hidden_size
    assert back.num_layers == cfg.num_layers
