"""Numerical parity of the Encoder trunk vs HF torch BertModel.

A randomly-initialized torch BertModel is converted through
models/hf_convert.py and both stacks run the same input; logit closeness
validates the trunk end-to-end (embeddings, fused QKV attention, post-LN
blocks, pooler). This is the offline equivalent of loading a pretrained
checkpoint (no network in this environment).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.models import hf_convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small_bert():
    hf_cfg = transformers.BertConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
        type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg).eval()
    return hf_cfg, model


def test_encoder_matches_hf_bert(small_bert):
    hf_cfg, torch_model = small_bert
    cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(torch_model.state_dict())
    params = hf_convert.bert_to_encoder_params(sd, cfg)

    rng = np.random.default_rng(0)
    B, L = 2, 17
    input_ids = rng.integers(0, hf_cfg.vocab_size, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    attention_mask[0, 12:] = 0  # padding on one row
    token_type_ids = rng.integers(0, 2, size=(B, L))

    with torch.no_grad():
        t_out = torch_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            token_type_ids=torch.tensor(token_type_ids),
        )

    enc = Encoder(cfg)
    j_out = enc.apply(
        {"params": params},
        jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.asarray(attention_mask, jnp.int32),
        token_type_ids=jnp.asarray(token_type_ids, jnp.int32),
        deterministic=True,
    )

    torch_seq = t_out.last_hidden_state.numpy()
    jax_seq = np.asarray(j_out.last_hidden_state)
    # compare only non-pad positions (HF computes garbage at padded queries too,
    # but values there are well-defined; compare everything for strictness)
    np.testing.assert_allclose(jax_seq, torch_seq, atol=2e-5, rtol=1e-4)

    torch_pooled = t_out.pooler_output.numpy()
    np.testing.assert_allclose(np.asarray(j_out.pooled_output), torch_pooled, atol=2e-5, rtol=1e-4)


def test_encoder_per_layer_hidden_states_match_hf(small_bert):
    """Every intermediate layer matches torch's output_hidden_states, not
    just the final one — the contract run_extract_features dumps (reference:
    action-item-detection/script/extract_features.py get_all_encoder_layers
    semantics: hidden_states[0] is the embedding output, layers follow)."""
    hf_cfg, torch_model = small_bert
    cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(torch_model.state_dict())
    params = hf_convert.bert_to_encoder_params(sd, cfg)

    rng = np.random.default_rng(1)
    B, L = 2, 17
    input_ids = rng.integers(0, hf_cfg.vocab_size, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    attention_mask[1, 13:] = 0

    with torch.no_grad():
        t_out = torch_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
        )

    enc = Encoder(cfg)
    j_out = enc.apply(
        {"params": params},
        jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.asarray(attention_mask, jnp.int32),
        deterministic=True,
        output_hidden_states=True,
    )
    assert len(j_out.hidden_states) == hf_cfg.num_hidden_layers + 1
    for i, (j_h, t_h) in enumerate(zip(j_out.hidden_states, t_out.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(j_h), t_h.numpy(), atol=2e-5, rtol=1e-4,
            err_msg=f"hidden_states[{i}]")


def test_encoder_jits_and_is_deterministic(small_bert):
    hf_cfg, torch_model = small_bert
    cfg = hf_convert.hf_bert_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(torch_model.state_dict())
    params = hf_convert.bert_to_encoder_params(sd, cfg)

    enc = Encoder(cfg)
    ids = jnp.ones((2, 16), jnp.int32)

    @jax.jit
    def fwd(p, x):
        return enc.apply({"params": p}, x).last_hidden_state

    a = fwd(params, ids)
    b = fwd(params, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
