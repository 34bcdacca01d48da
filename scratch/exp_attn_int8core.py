"""int8 attention-core (QK^T/AV) vs the bf16-core W8A8 kernel: time + parity."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.ops.pallas.attention_block import fused_attention_block

B, L, H, nh, hd = 16, 512, 768, 12, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32) * 0.5).astype(
    jnp.bfloat16
)
seg = np.ones((B, L), np.int32)
seg[0, 400:] = 0
seg = jnp.asarray(seg)
qkv_k = jnp.asarray(rng.normal(size=(H, 3, nh, hd)).astype(np.float32) * 0.05)
qkv_b = jnp.asarray(rng.normal(size=(3, nh, hd)).astype(np.float32) * 0.02)
out_k = jnp.asarray(rng.normal(size=(nh, hd, H)).astype(np.float32) * 0.05)
out_b = jnp.zeros((H,), jnp.float32)
s = 1.0 / hd**0.5
ln_s = jnp.ones((H,), jnp.float32)
ln_b = jnp.zeros((H,), jnp.float32)


def run(core, xx):
    return fused_attention_block(
        xx, seg, qkv_k, qkv_b, out_k, out_b, s, quantized=True,
        ln_scale=ln_s, ln_bias=ln_b, core_int8=core,
    )


o0 = np.asarray(run(False, x).astype(jnp.float32))
valid = np.asarray(seg > 0)[:, :, None]
for mode in ("qk", "av", "both"):
    o1 = np.asarray(run(mode, x).astype(jnp.float32))
    d = np.abs(o1 - o0)[np.broadcast_to(valid, o0.shape)]
    print(f"parity[{mode}] vs bf16-core: mean|d| {d.mean():.4f} max {d.max():.4f} "
          f"(out scale {np.abs(o0).mean():.3f})", flush=True)

BT, iters = 128, (8, 32)
xt = jnp.asarray(rng.normal(size=(BT, L, H)).astype(np.float32) * 0.5).astype(
    jnp.bfloat16
)
segt = jnp.ones((BT, L), jnp.int32)


def timed(core):
    @jax.jit
    def loop(xx, n):
        def body(i, carry):
            h = fused_attention_block(
                carry, segt, qkv_k, qkv_b, out_k, out_b, s, quantized=True,
                ln_scale=ln_s, ln_bias=ln_b, core_int8=core,
            )
            return h
        return jax.lax.fori_loop(0, n, body, xx)[0, 0, 0].astype(jnp.float32)

    _ = float(loop(xt, 1))
    ts = {}
    for n in iters:
        t0 = time.perf_counter()
        _ = float(loop(xt, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])
    print(f"core_int8={core}: {per*1e3:.2f} ms/layer @B={BT}", flush=True)


timed(False)
for mode in ("qk", "av", "both"):
    timed(mode)
