"""CLIP ViT vision tower: HF conversion parity + frame pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spokennlp_tpu.models.clip_vit import (
    CLIPViTConfig,
    CLIPVisionTower,
    encode_clip_frames,
    hf_clip_vision_config_to_vit_config,
    hf_clip_vision_to_params,
    preprocess_images,
    quick_gelu,
)


def test_quick_gelu_matches_torch_formula():
    x = np.linspace(-4, 4, 33).astype(np.float32)
    got = np.asarray(quick_gelu(jnp.asarray(x)))
    want = x * (1.0 / (1.0 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hf_clip_vision_parity():
    """Randomly-initialized transformers CLIPVisionModelWithProjection vs the
    converted Flax tower: image embeddings must match."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, projection_dim=16,
        hidden_act="quick_gelu",
    )
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = hf_clip_vision_config_to_vit_config(hf_cfg)
    params = hf_clip_vision_to_params(sd, cfg)
    model = CLIPVisionTower(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(pixels)))
    with torch.no_grad():
        want = hf(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_preprocess_shapes_and_range():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(3, 60, 80, 3)).astype(np.uint8)
    out = preprocess_images(imgs, image_size=32)
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.float32
    # CLIP normalization: roughly centered
    assert abs(out.mean()) < 2.0


def test_encode_clip_frames_pools_per_clip():
    cfg = CLIPViTConfig(image_size=16, patch_size=8, hidden_size=16,
                        num_layers=1, num_heads=2, intermediate_size=32,
                        projection_dim=8)
    model = CLIPVisionTower(cfg)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(5, 20, 20, 3)).astype(np.uint8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    feats = encode_clip_frames(model, params, frames, [2, 0, 3], batch_size=4)
    assert feats.shape == (3, 8)
    assert np.allclose(feats[1], 0.0)  # empty clip -> zeros
    assert np.isfinite(feats).all()
