"""Per-kernel bench: fused attention block S=1 vs S=2 (raised VMEM limit).

Monkeypatches pl.pallas_call to inject compiler_params with a higher
vmem_limit_bytes so the S=2 variant (17.1 MB working set) can compile.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 100 * 1024 * 1024

_orig_call = pl.pallas_call


def patched_call(*args, **kw):
    kw.setdefault("compiler_params", pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT))
    return _orig_call(*args, **kw)


pl.pallas_call = patched_call

import spokennlp_tpu.ops.pallas.attention_block as ab

ab.pl = pl  # not needed (imports inside fn) but harmless

from spokennlp_tpu.ops.pallas.attention_block import fused_attention_block

B, L, H, nh, hd = 128, 512, 768, 12, 64
rng = np.random.default_rng(0)
hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
seg = jnp.ones((B, L), jnp.int32)
qkv_k = jnp.asarray(rng.normal(0, 0.02, (H, 3, nh, hd)), jnp.float32)
qkv_b = jnp.zeros((3, nh, hd), jnp.float32)
out_k = jnp.asarray(rng.normal(0, 0.02, (nh, hd, H)), jnp.float32)
out_b = jnp.zeros((H,), jnp.float32)
lns = jnp.ones((H,), jnp.float32)
lnb = jnp.zeros((H,), jnp.float32)


def bench(S, quantized=True, n1=4, n2=32):
    @jax.jit
    def run(hidden, iters):
        def body(i, h):
            return fused_attention_block(
                h, seg, qkv_k, qkv_b, out_k, out_b,
                sm_scale=0.125, heads_per_block=12, quantized=quantized,
                ln_scale=lns, ln_bias=lnb, seqs_per_block=S,
            )
        return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]

    try:
        _ = float(run(hidden, 2))
    except Exception as e:
        print(f"S={S}: FAILED {type(e).__name__}: {str(e)[:240]}")
        return
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(hidden, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"S={S} q={quantized}: {per*1e3:.3f} ms/layer-call")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for S in (1, 2, 4):
        bench(S)
