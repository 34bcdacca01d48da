"""Numerical parity of the sliding-window trunk vs HF torch LongformerModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.models import hf_convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small_longformer():
    hf_cfg = transformers.LongformerConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=130,
        type_vocab_size=1,
        attention_window=[8, 8],
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.LongformerModel(hf_cfg).eval()
    return hf_cfg, model


def test_sliding_window_matches_hf_longformer(small_longformer):
    hf_cfg, torch_model = small_longformer
    cfg = hf_convert.hf_longformer_config_to_encoder_config(hf_cfg)
    sd = hf_convert.torch_state_dict_to_numpy(torch_model.state_dict())
    params = hf_convert.longformer_to_encoder_params(sd, cfg)

    rng = np.random.default_rng(0)
    B, L = 2, 32  # multiple of the window
    input_ids = rng.integers(5, 255, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    attention_mask[1, 28:] = 0
    input_ids[1, 28:] = hf_cfg.pad_token_id
    global_mask = np.zeros((B, L), dtype=np.int64)
    global_mask[:, 0] = 1  # CLS global, like the reference wrapper

    with torch.no_grad():
        t_out = torch_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            global_attention_mask=torch.tensor(global_mask),
        )

    enc = Encoder(cfg)
    j_out = enc.apply(
        {"params": params},
        jnp.asarray(input_ids, jnp.int32),
        attention_mask=jnp.asarray(attention_mask, jnp.int32),
        global_attention_mask=jnp.asarray(global_mask, jnp.int32),
        deterministic=True,
    )

    torch_seq = t_out.last_hidden_state.numpy()
    jax_seq = np.asarray(j_out.last_hidden_state)
    # compare non-pad positions (HF zeroes padded outputs differently)
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(
        jax_seq[valid], torch_seq[valid], atol=5e-5, rtol=1e-3
    )


def test_position_embedding_tiling():
    table = np.arange(12, dtype=np.float32).reshape(6, 2)
    params = {"embeddings": {"position_embeddings": {"embedding": table}}}
    out = hf_convert.extend_position_embeddings(params, 10, num_special=2)
    new = out["embeddings"]["position_embeddings"]["embedding"]
    assert new.shape == (10, 2)
    np.testing.assert_array_equal(new[:2], table[:2])  # special rows kept
    np.testing.assert_array_equal(new[2:6], table[2:])
    np.testing.assert_array_equal(new[6:10], table[2:])  # tiled period
