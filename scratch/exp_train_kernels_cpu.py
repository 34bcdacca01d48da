"""Interpret-mode numerics check of train_blocks vs einsum oracles (CPU)."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.ops.pallas.train_blocks import (
    attention_block_train,
    mlp_block_train,
)
from spokennlp_tpu.ops.pallas.attention_block import reference_attention_block

rng = np.random.default_rng(0)
B, L, H, nh, hd = 2, 128, 64, 4, 16
x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
seg = jnp.asarray(
    np.where(np.arange(L)[None] < np.array([[100], [128]]) , 1, 0).astype(np.int32)
)
qkv_k = jnp.asarray(rng.normal(size=(H, 3, nh, hd)).astype(np.float32) * 0.1)
qkv_b = jnp.asarray(rng.normal(size=(3, nh, hd)).astype(np.float32) * 0.1)
out_k = jnp.asarray(rng.normal(size=(nh, hd, H)).astype(np.float32) * 0.1)
out_b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
seed = jnp.zeros((1,), jnp.int32)
s = 1.0 / hd**0.5
w = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))


def f_kernel(x, qkv_k, qkv_b, out_k, out_b):
    o = attention_block_train(x, seg, qkv_k, qkv_b, out_k, out_b, seed, s,
                              dropout_rate=0.0, interpret=True)
    return jnp.sum(o * w), o


def f_oracle(x, qkv_k, qkv_b, out_k, out_b):
    o = reference_attention_block(x, seg, qkv_k, qkv_b, out_k, out_b, s)
    return jnp.sum(o * w), o


(_, ok), gk = jax.value_and_grad(f_kernel, argnums=(0, 1, 2, 3, 4), has_aux=True)(
    x, qkv_k, qkv_b, out_k, out_b
)
(_, oo), go = jax.value_and_grad(f_oracle, argnums=(0, 1, 2, 3, 4), has_aux=True)(
    x, qkv_k, qkv_b, out_k, out_b
)
print("attn fwd max err:", float(jnp.max(jnp.abs(ok - oo))))
for name, a, b in zip(("dx", "dwqkv", "dbqkv", "dwo", "dbo"), gk, go):
    err = float(jnp.max(jnp.abs(a - b.reshape(a.shape))))
    den = float(jnp.max(jnp.abs(b))) + 1e-9
    print(f"attn {name}: max abs err {err:.2e} (rel {err/den:.2e})")

# --- dropout: finite-difference check (same seed => same mask) ---
rate = 0.3


def f_drop(x):
    o = attention_block_train(x, seg, qkv_k, qkv_b, out_k, out_b, seed, s,
                              dropout_rate=rate, interpret=True)
    return jnp.sum(o * w)


try:
    g = jax.grad(f_drop)(x)
    d = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    eps = 1e-3
    fd = (f_drop(x + eps * d) - f_drop(x - eps * d)) / (2 * eps)
    an = jnp.sum(g * d)
    print(f"attn dropout fd check: fd={float(fd):.5f} an={float(an):.5f}")
    o1 = attention_block_train(x, seg, qkv_k, qkv_b, out_k, out_b, seed, s,
                               dropout_rate=rate, interpret=True)
    o2 = attention_block_train(x, seg, qkv_k, qkv_b, out_k, out_b, seed, s,
                               dropout_rate=0.0, interpret=True)
    print("attn dropout changes output:", bool(jnp.max(jnp.abs(o1 - o2)) > 1e-3))
except Exception as e:  # interpret-mode PRNG may be unsupported
    print("dropout interpret-mode check failed:", type(e).__name__, e)

# --- MLP ---
M, I = 96, 128
xm = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))
w1 = jnp.asarray(rng.normal(size=(H, I)).astype(np.float32) * 0.1)
b1 = jnp.asarray(rng.normal(size=(I,)).astype(np.float32) * 0.1)
w2 = jnp.asarray(rng.normal(size=(I, H)).astype(np.float32) * 0.1)
b2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
wm = jnp.asarray(rng.normal(size=(M, H)).astype(np.float32))


def m_kernel(xm, w1, b1, w2, b2):
    o = mlp_block_train(xm, w1, b1, w2, b2, activation="gelu", block_m=32,
                        interpret=True)
    return jnp.sum(o * wm), o


def m_oracle(xm, w1, b1, w2, b2):
    h = jax.nn.gelu(xm @ w1 + b1, approximate=True)
    o = h @ w2 + b2
    return jnp.sum(o * wm), o


(_, ok), gk = jax.value_and_grad(m_kernel, argnums=(0, 1, 2, 3, 4), has_aux=True)(
    xm, w1, b1, w2, b2
)
(_, oo), go = jax.value_and_grad(m_oracle, argnums=(0, 1, 2, 3, 4), has_aux=True)(
    xm, w1, b1, w2, b2
)
print("mlp fwd max err:", float(jnp.max(jnp.abs(ok - oo))))
for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gk, go):
    err = float(jnp.max(jnp.abs(a - b.reshape(a.shape))))
    den = float(jnp.max(jnp.abs(b))) + 1e-9
    print(f"mlp {name}: max abs err {err:.2e} (rel {err/den:.2e})")
print("OK")
