"""On-chip check + timing of the train_blocks kernels at BERT-base shapes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.ops.pallas.train_blocks import (
    attention_block_train,
    mlp_block_train,
)

B, L, H, nh, hd, I = 16, 512, 768, 12, 64, 3072
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)).astype(jnp.bfloat16)
seg = jnp.ones((B, L), jnp.int32)
qkv_k = jnp.asarray(rng.normal(size=(H, 3, nh, hd)).astype(np.float32) * 0.03)
qkv_b = jnp.zeros((3, nh, hd), jnp.float32)
out_k = jnp.asarray(rng.normal(size=(nh, hd, H)).astype(np.float32) * 0.03)
out_b = jnp.zeros((H,), jnp.float32)
seed = jnp.zeros((1,), jnp.int32)
s = 1.0 / hd**0.5
cot = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)).astype(jnp.bfloat16)
rate = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1


@jax.jit
def attn_fb(x, qkv_k, qkv_b, out_k, out_b, iters):
    def body(i, carry):
        xx, acc = carry
        def f(args):
            return jnp.sum(
                attention_block_train(
                    args[0], seg, args[1], args[2], args[3], args[4], seed, s,
                    dropout_rate=rate,
                ).astype(jnp.float32)
                * cot.astype(jnp.float32)
            )
        l, g = jax.value_and_grad(f)((xx, qkv_k, qkv_b, out_k, out_b))
        return (xx + 0 * g[0].astype(xx.dtype), acc + l)

    _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.zeros((), jnp.float32)))
    return acc


xm = x.reshape(B * L, H)
w1 = jnp.asarray(rng.normal(size=(H, I)).astype(np.float32) * 0.03)
b1 = jnp.zeros((I,), jnp.float32)
w2 = jnp.asarray(rng.normal(size=(I, H)).astype(np.float32) * 0.03)
b2 = jnp.zeros((H,), jnp.float32)
cotm = cot.reshape(B * L, H)


@jax.jit
def mlp_fb(xm, w1, b1, w2, b2, iters):
    def body(i, carry):
        xx, acc = carry
        def f(args):
            return jnp.sum(
                mlp_block_train(args[0], args[1], args[2], args[3], args[4])
                .astype(jnp.float32) * cotm.astype(jnp.float32)
            )
        l, g = jax.value_and_grad(f)((xx, w1, b1, w2, b2))
        return (xx + 0 * g[0].astype(xx.dtype), acc + l)

    _, acc = jax.lax.fori_loop(0, iters, body, (xm, jnp.zeros((), jnp.float32)))
    return acc


for name, fn, args in (("attn", attn_fb, (x, qkv_k, qkv_b, out_k, out_b)),
                       ("mlp", mlp_fb, (xm, w1, b1, w2, b2))):
    t0 = time.perf_counter()
    _ = float(fn(*args, 1))
    print(f"{name} compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (4, 16):
        t0 = time.perf_counter()
        _ = float(fn(*args, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[16] - ts[4]) / 12
    print(f"{name} fwd+bwd (rate={rate}): {per*1e3:.2f} ms/iter (B={B})", flush=True)
