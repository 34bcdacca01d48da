"""CLIP ViT vision tower (Flax): frame features for MMVTS vis2d.

The reference vendors OpenAI CLIP and encodes key frames with ViT-B/16,
then max-pools frames per clip (reference: mmvts/src/models/vis_encoder/
vis2d_encoder.py:14-35 and vis_encoder.py:33-46; vendored model at
vis_encoder/clip/model.py:206-241). This is a TPU-native rebuild:

- pre-norm ViT with QuickGELU (x * sigmoid(1.702 x)), class token,
  learned absolute positions, ln_pre/ln_post, linear projection —
  the CLIP vision architecture;
- weights convert from HF ``CLIPVisionModelWithProjection`` state dicts
  (models/hf_convert.py-style mapping, parity-tested);
- host-side preprocessing (resize + CLIP normalization) in pure numpy,
  so no torch/PIL dependency on the feature-dump path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _ViTBlock(nn.Module):
    """Pre-norm residual attention block (CLIP convention)."""

    cfg: CLIPViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg
        nh = c.num_heads
        hd = c.hidden_size // nh
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.DenseGeneral((3, nh, hd), axis=-1, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, self.dtype))
        scores = jnp.einsum("blnd,bmnd->bnlm", q * scale, k)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        ctx = jnp.einsum("bnlm,bmnd->blnd", probs, v)
        attn = nn.DenseGeneral(
            c.hidden_size, axis=(-2, -1), dtype=self.dtype, name="out"
        )(ctx)
        x = x + attn
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_in")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_out")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """pixels (B, H, W, 3) float in CLIP-normalized space -> (B, proj_dim)."""

    cfg: CLIPViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: Array) -> Array:
        c = self.cfg
        B = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(B, -1, c.hidden_size)  # (B, P, H)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (c.num_patches + 1, c.hidden_size),
        )
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_pre")(x)
        for i in range(c.num_layers):
            x = _ViTBlock(c, dtype=self.dtype, name=f"block_{i}")(x)
        cls_out = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_post"
        )(x[:, 0])
        proj = self.param(
            "proj",
            nn.initializers.normal(0.02),
            (c.hidden_size, c.projection_dim),
        )
        return cls_out @ proj.astype(self.dtype)


# ---------------------------------------------------------------------------
# HF checkpoint conversion (transformers CLIPVisionModelWithProjection)
# ---------------------------------------------------------------------------


def hf_clip_vision_config_to_vit_config(hf_cfg) -> CLIPViTConfig:
    return CLIPViTConfig(
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        projection_dim=getattr(hf_cfg, "projection_dim", 512),
        layer_norm_eps=hf_cfg.layer_norm_eps,
    )


def hf_clip_vision_to_params(sd: Dict[str, np.ndarray], cfg: CLIPViTConfig) -> Dict:
    """transformers CLIPVisionModelWithProjection numpy state dict -> params.

    HF names: vision_model.embeddings.{class_embedding, patch_embedding.weight,
    position_embedding.weight}, vision_model.pre_layrnorm, vision_model.
    encoder.layers.N.{layer_norm1, self_attn.{q,k,v,out}_proj, layer_norm2,
    mlp.fc1/fc2}, vision_model.post_layernorm, visual_projection.weight.
    """
    c = cfg
    nh, hd = c.num_heads, c.hidden_size // c.num_heads
    p = "vision_model."

    def ln(name):
        return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}

    params: Dict[str, Any] = {
        # torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)
        "patch_embed": {
            "kernel": sd[p + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        },
        "class_embedding": sd[p + "embeddings.class_embedding"].reshape(-1),
        "positional_embedding": sd[p + "embeddings.position_embedding.weight"],
        "ln_pre": ln(p + "pre_layrnorm"),
        "ln_post": ln(p + "post_layernorm"),
        "proj": sd["visual_projection.weight"].T,
    }
    for i in range(c.num_layers):
        q = p + f"encoder.layers.{i}."
        qw = sd[q + "self_attn.q_proj.weight"]
        kw = sd[q + "self_attn.k_proj.weight"]
        vw = sd[q + "self_attn.v_proj.weight"]
        qb = sd[q + "self_attn.q_proj.bias"]
        kb = sd[q + "self_attn.k_proj.bias"]
        vb = sd[q + "self_attn.v_proj.bias"]
        # torch Linear weight (out, in): DenseGeneral (in, 3, nh, hd)
        wqkv = np.stack([qw.T, kw.T, vw.T], axis=1).reshape(
            c.hidden_size, 3, nh, hd
        )
        bqkv = np.stack([qb, kb, vb], axis=0).reshape(3, nh, hd)
        ow = sd[q + "self_attn.out_proj.weight"].T.reshape(nh, hd, c.hidden_size)
        params[f"block_{i}"] = {
            "ln_1": ln(q + "layer_norm1"),
            "ln_2": ln(q + "layer_norm2"),
            "qkv": {"kernel": wqkv, "bias": bqkv},
            "out": {
                "kernel": ow,
                "bias": sd[q + "self_attn.out_proj.bias"],
            },
            "mlp_in": {
                "kernel": sd[q + "mlp.fc1.weight"].T,
                "bias": sd[q + "mlp.fc1.bias"],
            },
            "mlp_out": {
                "kernel": sd[q + "mlp.fc2.weight"].T,
                "bias": sd[q + "mlp.fc2.bias"],
            },
        }
    return params


# ---------------------------------------------------------------------------
# host-side preprocessing + per-clip frame features
# ---------------------------------------------------------------------------


def preprocess_images(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8/float (B, H, W, 3) -> CLIP-normalized float32 (B, S, S, 3).

    Bilinear resize in numpy (no PIL/torch): matches CLIP's Resize+CenterCrop
    closely enough for feature extraction (shorter side to S, center crop).
    """
    imgs = np.asarray(images)
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    B, H, W, _ = imgs.shape
    scale = image_size / min(H, W)
    nh, nw = max(int(round(H * scale)), image_size), max(
        int(round(W * scale)), image_size
    )

    def resize_axis(a, n, axis):
        src = np.linspace(0, a.shape[axis] - 1, n)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, a.shape[axis] - 1)
        frac = (src - lo).astype(np.float32)
        sl = [slice(None)] * a.ndim
        sl_lo, sl_hi = list(sl), list(sl)
        sl_lo[axis], sl_hi[axis] = lo, hi
        shape = [1] * a.ndim
        shape[axis] = n
        f = frac.reshape(shape)
        return a[tuple(sl_lo)] * (1 - f) + a[tuple(sl_hi)] * f

    imgs = resize_axis(imgs, nh, 1)
    imgs = resize_axis(imgs, nw, 2)
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    imgs = imgs[:, top : top + image_size, left : left + image_size]
    return ((imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD).astype(np.float32)


def encode_clip_frames(
    model: CLIPVisionTower,
    params,
    frames: np.ndarray,  # (n_frames, H, W, 3)
    clip_frame_counts,  # frames-per-clip list, sums to n_frames
    batch_size: int = 32,
) -> np.ndarray:
    """Frame features max-pooled per clip (vis_encoder.py:33-46);
    returns (n_clips, proj_dim)."""
    pixels = preprocess_images(frames, model.cfg.image_size)

    @jax.jit
    def run(p, x):
        return model.apply({"params": p}, x)

    feats = []
    n = pixels.shape[0]
    for s in range(0, n, batch_size):
        chunk = pixels[s : s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        out = np.asarray(run(params, jnp.asarray(chunk)))
        feats.append(out[: batch_size - pad if pad else batch_size])
    flat = np.concatenate(feats, axis=0)
    out, pos = [], 0
    for cnt in clip_frame_counts:
        out.append(
            flat[pos : pos + cnt].max(axis=0)
            if cnt
            else np.zeros(flat.shape[-1], np.float32)
        )
        pos += cnt
    return np.stack(out)
