"""Sweep fused_mlp_block block_m with raised VMEM limit (B*L=65536, H=768,
I=3072). Monkeypatch pallas_call to inject vmem_limit_bytes."""

import time

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_orig = pl.pallas_call


def patched(*a, **kw):
    kw.setdefault("compiler_params", pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    return _orig(*a, **kw)


pl.pallas_call = patched

from spokennlp_tpu.ops.pallas import mlp_block
mlp_block.__dict__  # module imported after patch; it imports pl lazily inside fn

from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block

M, H, I = 65536, 768, 3072
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.bfloat16)
w1 = jnp.asarray(rng.normal(0, 0.02, (H, I)), jnp.float32)
b1 = jnp.zeros((I,), jnp.float32)
w2 = jnp.asarray(rng.normal(0, 0.02, (I, H)), jnp.float32)
b2 = jnp.zeros((H,), jnp.float32)
lns = jnp.ones((H,), jnp.float32)
lnb = jnp.zeros((H,), jnp.float32)


def bench(bm, n1=4, n2=16):
    @jax.jit
    def run(x, iters):
        def body(i, h):
            return fused_mlp_block(h, w1, b1, w2, b2, lns, lnb,
                                   quantized=True, block_m=bm)
        return jax.lax.fori_loop(0, iters, body, x)[0, 0]

    try:
        _ = float(run(x, 1))
    except Exception as e:
        print(f"bm={bm}: FAILED {str(e)[:200]}", flush=True)
        return
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(x, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    tops = 2 * 2 * M * H * I / per / 1e12
    print(f"bm={bm}: {per*1e3:.3f} ms/layer-mlp -> {tops:.0f} TOPS-equiv", flush=True)


if __name__ == "__main__":
    for bm in (512, 1024, 2048, 4096):
        bench(bm)
