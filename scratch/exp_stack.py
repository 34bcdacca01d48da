"""Megakernel (fused_encoder_stack) vs the per-layer two-kernel path:
correctness on-chip (same quantized math) + throughput."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from spokennlp_tpu.ops.pallas.stack_block import fused_encoder_stack
from spokennlp_tpu.ops.pallas.attention_block import fused_attention_block
from spokennlp_tpu.ops.pallas.mlp_block import fused_mlp_block

NL, H, nh, hd, I = 12, 768, 12, 64, 3072


def make_params(rng):
    p = {}
    p["qkv_k"] = jnp.asarray(rng.normal(0, 0.02, (NL, H, 3, nh, hd)), jnp.float32)
    p["qkv_b"] = jnp.asarray(rng.normal(0, 0.02, (NL, 3, nh, hd)), jnp.float32)
    p["out_k"] = jnp.asarray(rng.normal(0, 0.02, (NL, nh, hd, H)), jnp.float32)
    p["out_b"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    p["ln1s"] = jnp.asarray(rng.normal(1, 0.02, (NL, H)), jnp.float32)
    p["ln1b"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    p["w1"] = jnp.asarray(rng.normal(0, 0.02, (NL, H, I)), jnp.float32)
    p["b1"] = jnp.asarray(rng.normal(0, 0.02, (NL, I)), jnp.float32)
    p["w2"] = jnp.asarray(rng.normal(0, 0.02, (NL, I, H)), jnp.float32)
    p["b2"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    p["ln2s"] = jnp.asarray(rng.normal(1, 0.02, (NL, H)), jnp.float32)
    p["ln2b"] = jnp.asarray(rng.normal(0, 0.02, (NL, H)), jnp.float32)
    return p


def run_stack(hidden, seg, p, quantized, interpret=False):
    return fused_encoder_stack(
        hidden, seg, p["qkv_k"], p["qkv_b"], p["out_k"], p["out_b"],
        p["ln1s"], p["ln1b"], p["w1"], p["b1"], p["w2"], p["b2"],
        p["ln2s"], p["ln2b"], sm_scale=hd ** -0.5, quantized=quantized,
        interpret=interpret,
    )


def run_layers(hidden, seg, p, quantized, interpret=False):
    h = hidden
    for l in range(NL):
        h = fused_attention_block(
            h, seg, p["qkv_k"][l], p["qkv_b"][l], p["out_k"][l], p["out_b"][l],
            sm_scale=hd ** -0.5, quantized=quantized, ln_scale=p["ln1s"][l],
            ln_bias=p["ln1b"][l], interpret=interpret,
        )
        B, L, _ = h.shape
        h = fused_mlp_block(
            h.reshape(B * L, H), p["w1"][l], p["b1"][l], p["w2"][l], p["b2"][l],
            p["ln2s"][l], p["ln2b"][l], quantized=quantized, interpret=interpret,
        ).reshape(B, L, H)
    return h


def check(B=4, L=256, quantized=True, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    p = make_params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
    seg = np.ones((B, L), np.int32)
    seg[:, L - 32:] = 0  # padding tail
    seg[1, : L // 2] = 1
    seg[1, L // 2: L - 32] = 2  # packed windows
    seg = jnp.asarray(seg)
    a = np.asarray(run_stack(hidden, seg, p, quantized, interpret), np.float32)
    b = np.asarray(run_layers(hidden, seg, p, quantized, interpret), np.float32)
    valid = np.asarray(seg)[:, :, None] > 0
    d = np.abs(a - b)[np.broadcast_to(valid, a.shape)]
    print(f"q={quantized}: mean|d|={d.mean():.5f} max|d|={d.max():.5f}")


def bench(B=128, L=512, quantized=True, n1=2, n2=8):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)

    for name, fn in (("stack", run_stack), ("layers", run_layers)):
        @jax.jit
        def run(hidden, iters, fn=fn):
            def body(i, h):
                return fn(h, seg, p, quantized)
            return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]

        try:
            _ = float(run(hidden, 1))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}")
            continue
        ts = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            _ = float(run(hidden, n))
            ts[n] = time.perf_counter() - t0
        per = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{name} q={quantized}: {per*1e3:.2f} ms/forward -> {B/per:.0f} w/s")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bench", choices=["check", "bench", "both"])
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    if args.mode in ("check", "both"):
        check(quantized=False)
        check(quantized=True)
    if args.mode in ("bench", "both"):
        bench(quantized=True)

# phased stack-only bench with progress prints (appended)
def bench_stack_only(B=128, L=512, quantized=True):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)
    print("compiling single forward...", flush=True)
    t0 = time.perf_counter()
    out = run_stack(hidden, seg, p, quantized)
    out.block_until_ready()
    print(f"compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)

    @jax.jit
    def run(hidden, iters):
        def body(i, h):
            return run_stack(h, seg, p, quantized)
        return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]

    t0 = time.perf_counter()
    _ = float(run(hidden, 1))
    print(f"loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (2, 8):
        t0 = time.perf_counter()
        _ = float(run(hidden, n))
        ts[n] = time.perf_counter() - t0
        print(f"n={n}: {ts[n]:.3f}s", flush=True)
    per = (ts[8] - ts[2]) / 6
    print(f"stack q={quantized}: {per*1e3:.2f} ms/forward -> {B/per:.0f} w/s", flush=True)

def bench_stack_v2(B=128, L=512, quantized=True):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)

    @jax.jit
    def run(p, hidden, iters):
        def body(i, h):
            return run_stack(h, seg, p, quantized)
        return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]

    t0 = time.perf_counter()
    _ = float(run(p, hidden, 1))
    print(f"loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (2, 8):
        t0 = time.perf_counter()
        _ = float(run(p, hidden, n))
        ts[n] = time.perf_counter() - t0
        print(f"n={n}: {ts[n]:.3f}s", flush=True)
    per = (ts[8] - ts[2]) / 6
    print(f"stack q={quantized}: {per*1e3:.2f} ms/forward -> {B/per:.0f} w/s", flush=True)

def bench_both_smallB(B=8, L=512, quantized=True):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)
    for name, fn in (("stack", run_stack), ("layers", run_layers)):
        @jax.jit
        def run(p, hidden, iters, fn=fn):
            def body(i, h):
                return fn(h, seg, p, quantized)
            return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]
        t0 = time.perf_counter()
        _ = float(run(p, hidden, 1))
        print(f"{name}: compile {time.perf_counter()-t0:.0f}s", flush=True)
        ts = {}
        for n in (4, 32):
            t0 = time.perf_counter()
            _ = float(run(p, hidden, n))
            ts[n] = time.perf_counter() - t0
        per = (ts[32] - ts[4]) / 28
        print(f"{name} B={B}: {per*1e3:.3f} ms/forward -> {B/per:.0f} w/s", flush=True)

def bench_crossover(quantized=True, L=512):
    rng = np.random.default_rng(0)
    p = make_params(rng)
    for B in (16, 32, 64):
        hidden = jnp.asarray(rng.normal(0, 1, (B, L, H)), jnp.bfloat16)
        seg = jnp.ones((B, L), jnp.int32)
        line = []
        for name, fn in (("stack", run_stack), ("layers", run_layers)):
            @jax.jit
            def run(p, hidden, iters, fn=fn, seg=seg):
                def body(i, h):
                    return fn(h, seg, p, quantized)
                return jax.lax.fori_loop(0, iters, body, hidden)[0, 0, 0]
            _ = float(run(p, hidden, 1))
            ts = {}
            for n in (4, 16):
                t0 = time.perf_counter()
                _ = float(run(p, hidden, n))
                ts[n] = time.perf_counter() - t0
            per = (ts[16] - ts[4]) / 12
            line.append(f"{name}={per*1e3:.2f}ms ({B/per:.0f} w/s)")
        print(f"B={B}: " + "  ".join(line), flush=True)
