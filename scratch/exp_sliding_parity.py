"""On-chip parity: fused sliding-block kernel vs the XLA chunked path at
Longformer-base scale (L=2048, window 512, CLS global, suffix padding)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel

B, L = 4, 2048


def build(sw_impl, quantize):
    enc = EncoderConfig(
        vocab_size=30522,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=L,
        add_pooler=False,
        attention_type="sliding_window",
        attention_window=512,
        max_global_tokens=16,
        softmax_in_compute_dtype=True,
        quantize=quantize,
        sliding_window_impl=sw_impl,
        attention_impl="fused" if sw_impl == "fused" else "auto",
    )
    return TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)


def main(quantize):
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(1000, 30000, size=(B, L)), np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 1500:] = 0
    mask[3, 777:] = 0  # suffix padding, odd boundary
    idsj, maskj = jnp.asarray(ids), jnp.asarray(mask)

    ref = build("chunked", quantize)
    params = ref.init(jax.random.PRNGKey(0), idsj, attention_mask=maskj,
                      deterministic=True)["params"]

    @jax.jit
    def run_ref(p, i, m):
        return ref.apply({"params": p}, i, attention_mask=m,
                         deterministic=True)["token_logits"]

    fused = build("fused", quantize)

    @jax.jit
    def run_fused(p, i, m):
        return fused.apply({"params": p}, i, attention_mask=m,
                           deterministic=True)["token_logits"]

    a = np.asarray(run_ref(params, idsj, maskj), np.float32)
    b = np.asarray(run_fused(params, idsj, maskj), np.float32)
    valid = mask.astype(bool)
    d = np.abs(a - b)[valid]
    agree = (a.argmax(-1) == b.argmax(-1))[valid].mean()
    print(
        f"{quantize}: argmax agreement {agree:.4f}, mean|dlogit| {d.mean():.4f},"
        f" max {d.max():.4f}", flush=True,
    )


if __name__ == "__main__":
    for q in sys.argv[1:] or ["none", "w8a8"]:
        main(q)
