"""GPT-2-base decode throughput: quantize none vs w8a8 (B=8, 128 new toks)."""

import dataclasses
import time
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.models.generation import greedy_generate
from spokennlp_tpu.models.gpt2 import GPT2Config, GPT2LMModel

CFG = GPT2Config(
    vocab_size=50257, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=512,
    embd_dropout=0.0, resid_dropout=0.0, attn_dropout=0.0,
)
B, P, MAXLEN = 8, 64, 192

rng = np.random.default_rng(0)
model_f = GPT2LMModel(CFG, dtype=jnp.bfloat16)
ids = jnp.asarray(rng.integers(3, 50000, size=(B, P)), jnp.int32)
am = jnp.ones_like(ids)
params = model_f.init(jax.random.PRNGKey(0), ids)["params"]


def bench(quantize):
    model = GPT2LMModel(dataclasses.replace(CFG, quantize=quantize), dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    out = greedy_generate(model, params, ids, am, max_len=MAXLEN, eos_id=50256)
    first_tok = int(out[0, P])
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = greedy_generate(model, params, ids, am, max_len=MAXLEN, eos_id=50256)
        _ = int(out[0, MAXLEN - 1])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    ntok = B * (MAXLEN - P)
    print(f"{quantize:5s}: compile {t_compile:.0f}s, {best*1e3:.0f} ms "
          f"-> {ntok/best:.0f} tok/s ({best/(MAXLEN-P)*1e3:.2f} ms/step), "
          f"first new tok {first_tok}", flush=True)


if __name__ == "__main__":
    bench("none")
    bench("w8a8")

def bench_xla_int8():
    import spokennlp_tpu.ops.pallas.int8_matmul as im
    orig = im.quant_dense
    def patched(x, kernel, bias=None, out_dtype=jnp.bfloat16, use_pallas=None, activation="none"):
        return orig(x, kernel, bias, out_dtype, use_pallas=False, activation=activation)
    im.quant_dense = patched
    try:
        bench("w8a8")
    finally:
        im.quant_dense = orig

def bench_prefill(quantize, B2=8, L2=512, n1=4, n2=16):
    import dataclasses as dc
    model = GPT2LMModel(dc.replace(CFG, quantize=quantize), dtype=jnp.bfloat16)
    rng2 = np.random.default_rng(1)
    ids2 = jnp.asarray(rng2.integers(3, 50000, size=(B2, L2)), jnp.int32)

    @jax.jit
    def run(params, ids, iters):
        def body(i, c):
            vids = jnp.clip(ids + i, 3, 50000)
            out = model.apply({"params": params}, vids, deterministic=True)
            return c + jnp.argmax(out["logits"][:, -1], -1).astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

    _ = int(run(params, ids2, 1))
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = int(run(params, ids2, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"prefill {quantize:5s}: {per*1e3:.2f} ms/forward (B={B2}, L={L2})", flush=True)
