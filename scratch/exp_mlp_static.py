"""Static sample-estimated intermediate scale vs per-row rowquant in the
fused MLP half-layer: time + parity (B*L=65536, H=768, I=3072, bm=1024)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block, reference_mlp_block

M, H, I = 65536, 768, 3072
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.bfloat16)
w1 = jnp.asarray(rng.normal(0, 0.02, (H, I)), jnp.float32)
b1 = jnp.asarray(rng.normal(0, 0.02, (I,)), jnp.float32)
w2 = jnp.asarray(rng.normal(0, 0.02, (I, H)), jnp.float32)
b2 = jnp.zeros((H,), jnp.float32)
lns = jnp.ones((H,), jnp.float32)
lnb = jnp.zeros((H,), jnp.float32)

oracle = np.asarray(
    reference_mlp_block(x[:4096], w1, b1, w2, b2, lns, lnb).astype(jnp.float32)
)
for static in (False, True):
    o = np.asarray(
        fused_mlp_block(
            x[:4096], w1, b1, w2, b2, lns, lnb, quantized=True,
            static_h_scale=static,
        ).astype(jnp.float32)
    )
    d = np.abs(o - oracle)
    print(f"static={static}: vs f32 oracle mean|d| {d.mean():.4f} "
          f"max {d.max():.4f} (out scale {np.abs(oracle).mean():.3f})",
          flush=True)


def bench(static, n1=8, n2=32):
    @jax.jit
    def run(x, iters):
        def body(i, h):
            return fused_mlp_block(h, w1, b1, w2, b2, lns, lnb,
                                   quantized=True, block_m=1024,
                                   static_h_scale=static)
        return jax.lax.fori_loop(0, iters, body, x)[0, 0]

    _ = float(run(x, 1))
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(x, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"static_h_scale={static}: {per*1e3:.3f} ms/layer-mlp", flush=True)


if __name__ == "__main__":
    for static in (False, True, False, True):
        bench(static)
