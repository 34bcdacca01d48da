"""BigBird block path: e2e timing + profile at (B=8, L=4096)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel

B, L = 8, 4096


def build(sm_bf16, bb_impl="auto", quantize="none", prefix=None):
    enc = EncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
        attention_type="bigbird", bigbird_block_size=64,
        softmax_in_compute_dtype=sm_bf16,
        bigbird_impl=bb_impl, quantize=quantize,
        attention_impl="fused" if bb_impl == "fused" else "auto",
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


def bench(tag, sm_bf16, n1=2, n2=8):
    if tag.startswith("fused"):
        run, args = build(True, "fused", "w8a8" if "w8a8" in tag else "none")
    else:
        run, args = build(sm_bf16)
    t0 = time.perf_counter()
    _ = float(run(*args, 1))
    print(f"{tag}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(*args, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{tag}: {per*1e3:.1f} ms/batch -> {B/per:.1f} seqs/s", flush=True)


if __name__ == "__main__":
    for tag in sys.argv[1:] or ["f32sm", "bf16sm"]:
        bench(tag, tag == "bf16sm")
