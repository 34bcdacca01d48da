"""Longformer-base @ L=2048 inference throughput (current chunked XLA path
vs candidate kernels). Methodology: on-device fori_loop, slope over two
iteration counts (tunnel intercept ~30 ms).

Usage: python scratch/exp_longformer.py [impl ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel

B, L = 16, 2048


def build(quantize="none", window=512, sw_impl="chunked"):
    enc = EncoderConfig(
        vocab_size=30522,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=L,
        add_pooler=False,
        attention_type="sliding_window",
        attention_window=window,
        max_global_tokens=16,
        softmax_in_compute_dtype=True,
        quantize=quantize,
        sliding_window_impl=sw_impl,
        attention_impl="fused" if sw_impl == "fused" else "auto",
    )
    model = TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 30000, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids, attention_mask=mask, deterministic=True
    )["params"]

    @jax.jit
    def run(params, ids, mask, iters):
        # chain each iteration's input on the previous result so XLA cannot
        # hoist the loop-invariant model call out of the fori_loop
        def body(i, carry):
            ids_i = ids.at[0, 0].set(
                3 + (carry.astype(jnp.int32) & 0x3FF) % 29000
            )
            out = model.apply(
                {"params": params}, ids_i, attention_mask=mask, deterministic=True
            )
            return carry + out["token_logits"][0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    return run, (params, ids, mask)


def bench(tag, quantize, sw_impl, n1=2, n2=8):
    run, args = build(quantize, sw_impl=sw_impl)
    t0 = time.perf_counter()
    _ = float(run(*args, 1))
    print(f"{tag}: warmup+compile {time.perf_counter() - t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(*args, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(
        f"{tag}: {per * 1e3:.1f} ms/batch of {B} -> "
        f"{B / per:.1f} windows(2048)/s", flush=True,
    )


if __name__ == "__main__":
    # variants: {chunked,fused}-{bf16,w8a8}
    for tag in sys.argv[1:] or ["chunked-bf16"]:
        sw, q = tag.split("-")
        bench(tag, "w8a8" if q == "w8a8" else "none", sw)
