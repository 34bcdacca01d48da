import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
L, hd = 16, 8
q = jnp.asarray(rng.normal(size=(L, hd)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(L, hd)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(L, hd)).astype(np.float32))
bias = jnp.where(jnp.arange(L) < 12, 0.0, -1e9)[None, :] * jnp.ones((L, 1))
s = 0.35
g = jnp.asarray(rng.normal(size=(L, hd)).astype(np.float32))


def fwd(q, k, v):
    S = q @ k.T * s + bias
    m = jnp.max(S, axis=-1, keepdims=True)
    e = jnp.exp(S - m)
    D = jnp.sum(e, axis=-1, keepdims=True)
    return (e @ v) / D


loss = lambda q, k, v: jnp.sum(fwd(q, k, v) * g)
dq_a, dk_a, dv_a = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

# manual replica of the kernel backward
S = q @ k.T * s + bias
m = jnp.max(S, axis=-1, keepdims=True)
e = jnp.exp(S - m)
D = jnp.sum(e, axis=-1, keepdims=True)
p = e / D
p_eff = p
dctx = g
dp = dctx @ v.T
rs = jnp.sum(dp * p_eff, axis=-1, keepdims=True)
dS = (p_eff * dp - p * rs) * s
dq_m = dS @ k
dk_m = dS.T @ q
dv_m = p_eff.T @ dctx
for n, a, b in (("dq", dq_a, dq_m), ("dk", dk_a, dk_m), ("dv", dv_a, dv_m)):
    print(n, float(jnp.max(jnp.abs(a - b))))
