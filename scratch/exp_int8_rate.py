"""Pure in-VMEM int8 matmul rate at fused-kernel shapes (no HBM writes in
the timed loop: the kernel loops the dot in-register and emits one row)."""

import functools
import time

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rate_kernel(x_ref, w_ref, o_ref, *, inner: int):
    def body(i, acc):
        # vary x slightly so dots aren't CSE'd (int8 vector arith is not
        # supported by Mosaic; detour through int32)
        x = ((x_ref[:].astype(jnp.int32) + i) % 127).astype(jnp.int8)
        return acc + jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)

    acc = jax.lax.fori_loop(0, inner, body, jnp.zeros(o_ref.shape, jnp.int32))
    o_ref[:] = acc


def bench_rate(M, K, N, inner=8, n1=4, n2=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    call = pl.pallas_call(
        functools.partial(rate_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0)),
        grid=(1,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def run(x, w, iters):
        def body(i, c):
            return c + call((x.astype(jnp.int32) + i).astype(jnp.int8), w)[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

    try:
        _ = int(run(x, w, 1))
    except Exception as e:
        print(f"M={M} K={K} N={N}: FAILED {str(e)[:200]}")
        return
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = int(run(x, w, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1) / inner
    tops = 2 * M * K * N / per / 1e12
    print(f"M={M:5d} K={K} N={N}: {per*1e6:7.1f} us/matmul -> {tops:.0f} TOPS")


if __name__ == "__main__":
    for M in (512, 1024, 2048, 4096):
        bench_rate(M, 768, 3072)
    bench_rate(512, 768, 2304)   # QKV proj shape
    bench_rate(512, 3072, 768)   # mlp_out shape
    bench_rate(4096, 3072, 768)
