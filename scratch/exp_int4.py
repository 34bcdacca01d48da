"""Microbench: does the v5e MXU run int8-activation x int4-weight matmuls
at 2x the int8 rate through Mosaic?  Slope-fit timing per ROUND1_NOTES
methodology (tunnel adds ~30ms fixed intercept per fetch)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def matmul_kernel(x_ref, w_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc


def make_mm(M, K, N, wdtype, bm=512):
    kernel = matmul_kernel

    @jax.jit
    def run(x, w, iters):
        def call(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                grid=(M // bm,),
                in_specs=[
                    pl.BlockSpec((bm, K), lambda i: (i, 0)),
                    pl.BlockSpec((K, N), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
            )(x, w)

        def body(i, c):
            # vary input trivially so nothing is CSE'd/hoisted
            o = call(x + i.astype(x.dtype))
            return c + o[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

    return run


def bench(M, K, N, wdtype, n1=8, n2=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wnp = rng.integers(-7, 7, (K, N))
    w = jnp.asarray(wnp, jnp.int8).astype(wdtype)
    run = make_mm(M, K, N, wdtype)
    try:
        _ = int(run(x, w, 2))
    except Exception as e:
        print(f"{wdtype.__name__ if hasattr(wdtype,'__name__') else wdtype}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = int(run(x, w, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    tops = 2 * M * K * N / per / 1e12
    print(f"w={wdtype}: {per*1e3:.3f} ms/iter -> {tops:.0f} TOPS")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for wd in (jnp.int8, jnp.int4):
        bench(8192, 768, 3072, wd)
