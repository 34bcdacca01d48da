"""Ablate PoNet mixer components at (B=8, L=4096, H=768) to find the time.

Variants time ONE mixer application (12x amortized in a fori loop over a
full 12-layer hidden chain to keep realistic weights/pipelining).
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.models.ponet import local_max_pool, smp_second_max

B, L, H = 8, 4096, 768


def make(variant):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(5, H, H)).astype(np.float32) * 0.02, jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    seg = jnp.asarray(
        np.minimum(np.arange(L) // 64, 255)[None].repeat(B, 0).astype(np.int32)
    )

    def mixer(h):
        q = h @ w[0]
        k = h @ w[1]
        v = h @ w[2]
        s_proj = h @ w[3]
        l_proj = h @ w[4]
        maskf = mask.astype(jnp.float32)[..., None]
        parts = []
        if variant in ("full", "ga"):
            denom = jnp.maximum(maskf.sum(axis=1), 1.0)
            g = (q * maskf).sum(axis=1) / denom
            att = jnp.einsum("bh,blh->bl", g.astype(jnp.float32), k.astype(jnp.float32))
            wts = jax.nn.softmax(att, axis=-1).astype(h.dtype)
            gp = jnp.einsum("bl,blh->bh", wts, v)
            parts.append(gp[:, None, :] * q)
        if variant in ("ga_vpu", "full_vpu"):
            # same math, elementwise-multiply + reductions (no matvec dots)
            denom = jnp.maximum(maskf.sum(axis=1), 1.0)
            g = (q * maskf).sum(axis=1) / denom
            att = (k.astype(jnp.float32) * g[:, None, :].astype(jnp.float32)).sum(-1)
            wts = jax.nn.softmax(att, axis=-1).astype(h.dtype)
            gp = (wts[:, :, None] * v).sum(axis=1)
            parts.append(gp[:, None, :] * q)
        if variant == "full_bf16":
            # pooling chain entirely in bf16: compare/select/max are exact
            # in any dtype; only the GA softmax stays f32
            denom = jnp.maximum(maskf.sum(axis=1), 1.0)
            g = ((q * mask[..., None].astype(h.dtype)).sum(axis=1, dtype=jnp.float32)
                 / denom).astype(h.dtype)
            att = (k * g[:, None, :]).sum(-1, dtype=jnp.float32)
            wts = jax.nn.softmax(att, axis=-1).astype(h.dtype)
            gp = (wts[:, :, None] * v).sum(axis=1, dtype=jnp.float32).astype(h.dtype)
            parts.append(gp[:, None, :] * q)
            smp = jax.vmap(lambda xs, ss: smp_second_max(xs, ss, 256))(
                s_proj, seg
            )
            parts.append(smp)
            parts.append(local_max_pool(l_proj, 3, mask))
        if variant == "full_vpu":
            smp = jax.vmap(
                lambda xs, ss: smp_second_max(xs.astype(jnp.float32), ss, 256)
            )(s_proj, seg).astype(h.dtype)
            parts.append(smp)
            parts.append(
                local_max_pool(l_proj.astype(jnp.float32), 3, mask).astype(h.dtype)
            )
        if variant in ("full", "smp"):
            smp = jax.vmap(
                lambda xs, ss: smp_second_max(xs.astype(jnp.float32), ss, 256)
            )(s_proj, seg).astype(h.dtype)
            parts.append(smp)
        if variant in ("full", "lmp"):
            parts.append(
                local_max_pool(l_proj.astype(jnp.float32), 3, mask).astype(h.dtype)
            )
        if not parts:
            parts = [q + s_proj + l_proj]
        mixed = jax.lax.optimization_barrier(sum(parts))
        return mixed @ w[0].T

    @jax.jit
    def run(x, iters):
        def body(i, h):
            return mixer(h) * 0.05 + x * 0.5
        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0].astype(jnp.float32)

    return run, x


def bench(variant, n1=4, n2=16):
    run, x = make(variant)
    t0 = time.perf_counter()
    _ = float(run(x, 1))
    print(f"{variant}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        _ = float(run(x, n))
        ts[n] = time.perf_counter() - t0
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{variant:8s}: {per*1e3:.2f} ms/mixer-layer (B={B}, L={L})", flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["proj_only", "ga", "lmp", "smp", "full"]:
        bench(v)
