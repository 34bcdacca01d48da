"""PoNet @ L=4096 throughput on v5e (MUG track-1 scale) + Longformer-4096
fused-kernel check. Slope methodology; data-dependent loop."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(tag, make_run, args, n1=2, n2=8):
    run = make_run
    t0 = time.perf_counter()
    _ = float(run(*args, 1))
    print(f"{tag}: warmup+compile {time.perf_counter() - t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(*args, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{tag}: {per * 1e3:.1f} ms/batch -> {args[1].shape[0] / per:.1f} seqs/s",
          flush=True)


def ponet(B=8, L=4096, quantize="none"):
    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.models.ponet import PoNetEncoder

    cfg = EncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
        quantize=quantize,
    )
    model = PoNetEncoder(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 30000, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    segs = jnp.asarray(
        np.minimum(np.arange(L) // 64, 63)[None].repeat(B, 0).astype(np.int32)
    )
    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask,
                        segment_ids=segs, deterministic=True)["params"]

    @jax.jit
    def run(params, ids, mask, segs, iters):
        def body(i, carry):
            ids_i = ids.at[0, 0].set(3 + (carry.astype(jnp.int32) & 0x3FF))
            out = model.apply({"params": params}, ids_i, attention_mask=mask,
                              segment_ids=segs, deterministic=True)
            return carry + out.last_hidden_state[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    return run, (params, ids, mask, segs)


def longformer4096(B=8, L=4096, quantize="w8a8"):
    from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
    from spokennlp_tpu.models.topic_seg import TopicSegModel

    enc = EncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
        attention_type="sliding_window", attention_window=512,
        max_global_tokens=16, softmax_in_compute_dtype=True,
        quantize=quantize, sliding_window_impl="fused", attention_impl="fused",
    )
    model = TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 30000, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask,
                        deterministic=True)["params"]

    @jax.jit
    def run(params, ids, mask, iters):
        def body(i, carry):
            ids_i = ids.at[0, 0].set(3 + (carry.astype(jnp.int32) & 0x3FF))
            out = model.apply({"params": params}, ids_i, attention_mask=mask,
                              deterministic=True)
            return carry + out["token_logits"][0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    return run, (params, ids, mask)


if __name__ == "__main__":
    for tag in sys.argv[1:] or ["ponet"]:
        if tag.startswith("ponet"):
            run, args = ponet(quantize="w8a8" if "w8a8" in tag else "none")
        else:
            run, args = longformer4096(quantize="w8a8" if "w8a8" in tag else "none")
        bench(tag, run, args)
