"""Flax WavLM vs transformers WavLMModel (random init, both LN variants)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.models.wavlm import (
    WavLMModel,
    extract_wavlm_features,
    hf_wavlm_config_to_config,
    hf_wavlm_to_params,
    relative_position_buckets,
)


def _tiny_hf_cfg(stable: bool):
    from transformers import WavLMConfig as HFConfig

    return HFConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(8, 8),
        conv_kernel=(4, 2),
        conv_stride=(2, 2),
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=32,
        max_bucket_distance=50,
    )


@pytest.mark.parametrize("stable", [False, True])
def test_wavlm_parity_vs_hf(stable):
    torch = pytest.importorskip("torch")
    from transformers import WavLMModel as HFWavLM

    hf_cfg = _tiny_hf_cfg(stable)
    hf = HFWavLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = hf_wavlm_config_to_config(hf_cfg)
    params = hf_wavlm_to_params(sd, cfg)
    model = WavLMModel(cfg)

    rng = np.random.default_rng(0)
    wave = rng.normal(size=(2, 400)).astype(np.float32) * 0.1
    got = model.apply({"params": params}, jnp.asarray(wave),
                      output_hidden_states=True)
    with torch.no_grad():
        want = hf(torch.from_numpy(wave), output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(),
        atol=3e-4, rtol=1e-3,
    )
    # middle layer tap (the SLD pipeline taps layer 23 of large)
    np.testing.assert_allclose(
        np.asarray(got["hidden_states"][1]),
        want.hidden_states[1].numpy(),
        atol=3e-4, rtol=1e-3,
    )


def test_hubert_parity_vs_hf():
    """HuBERT = the same stack with plain MHA (use_rel_pos_bias=False);
    reference alternative dumper: simple_kmeans/dump_hubert_feature.py."""
    torch = pytest.importorskip("torch")
    from transformers import HubertConfig, HubertModel

    from spokennlp_tpu.models.wavlm import hf_hubert_config_to_config

    hf_cfg = HubertConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(8, 8),
        conv_kernel=(4, 2),
        conv_stride=(2, 2),
        conv_bias=False,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    hf = HubertModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = hf_hubert_config_to_config(hf_cfg)
    assert not cfg.use_rel_pos_bias
    params = hf_wavlm_to_params(sd, cfg)
    model = WavLMModel(cfg)

    rng = np.random.default_rng(2)
    wave = rng.normal(size=(2, 400)).astype(np.float32) * 0.1
    got = model.apply({"params": params}, jnp.asarray(wave))
    with torch.no_grad():
        want = hf(torch.from_numpy(wave))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(),
        atol=3e-4, rtol=1e-3,
    )


def test_relative_position_buckets_properties():
    b = relative_position_buckets(12, num_buckets=32, max_distance=50)
    assert b.shape == (12, 12)
    assert (np.diag(b) == 0).all()           # zero distance -> bucket 0
    assert (b[0, 1:] >= 16).all()            # future positions in upper half
    assert b.max() < 32 and b.min() >= 0


def test_extract_wavlm_features_chunked():
    from spokennlp_tpu.models.wavlm import WavLMConfig

    cfg = WavLMConfig(hidden_size=16, num_layers=1, num_heads=2,
                      intermediate_size=32, conv_dim=(8,), conv_kernel=(4,),
                      conv_stride=(2,), num_conv_pos_embeddings=8,
                      num_conv_pos_embedding_groups=2, num_buckets=16,
                      max_bucket_distance=20)
    model = WavLMModel(cfg)
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 128)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wave))["params"]
    feats = extract_wavlm_features(model, params, wave, layer=1,
                                   chunk_samples=64)
    assert feats.shape[0] == 1 and feats.shape[2] == 16
    assert np.isfinite(feats).all()
