"""W8A8 (int8 weight + int8 activation) matmul with fused dequant epilogue.

The north-star inference path is MXU-bound on bf16 projections
(bf16 peak ~197 TFLOPs on v5e; the 5k windows/s target exceeds the bf16
speed-of-light, BASELINE.md). The v5e MXU runs int8xint8->int32 at 2x the
bf16 rate (~394 TOPS), but XLA's int8 dot_general lowering was measured at
only ~87 TOPS (ROUND1_NOTES), so the int8 path is a custom Pallas kernel:

  x_int8 (M, K) . w_int8 (K, N) -> int32 acc -> f32 * row_scale * col_scale
  (+ bias) -> bf16, all in one VMEM-resident epilogue.

Quantization scheme (standard dynamic W8A8):
  - weights: per-output-channel symmetric absmax (computed once per forward
    from the f32 params; a few MB of VPU work, fully XLA-fused)
  - activations: per-row (per-token) symmetric absmax, computed on the fly

The reference has no quantized path at all (torch fp32/fp16 encoders,
reference: emnlp2023-topic_segmentation/src/models/bert_for_ts.py); this is
TPU-native headroom, used for inference only (rounding is not differentiated).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def quantize_rowwise(x: Array):
    """(..., K) float -> (int8 (..., K), f32 (..., 1)) per-row absmax scales."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_colwise(w: Array):
    """(K, N) float -> (int8 (K, N), f32 (1, N)) per-output-channel scales."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _w8a8_kernel(x_ref, sx_ref, w_ref, sw_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (
        acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:] + b_ref[:]
    ).astype(o_ref.dtype)


def _pick_block_m(m: int, n: int, k: int) -> int:
    """Largest M block whose VMEM working set (x, 2x double-buffered out,
    resident w) stays well under the ~16 MB budget."""
    for bm in (2048, 1024, 512, 256):
        if bm > m:
            continue
        vmem = 2 * bm * k + 2 * bm * n * 2 + k * n + 2 * n * 4
        if vmem <= 10 * 1024 * 1024:
            return bm
    return min(m, 256)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "interpret")
)
def w8a8_matmul(
    x8: Array,
    sx: Array,
    w8: Array,
    sw: Array,
    bias: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """int8 (M, K) @ int8 (K, N) -> out_dtype (M, N) with fused dequant.

    Args:
      x8: int8 activations (M, K); sx: f32 (M, 1) row scales.
      w8: int8 weights (K, N); sw: f32 (1, N) column scales.
      bias: optional f32 (N,) added in the epilogue.
      interpret: run the kernel in interpreter mode (CPU tests).
    """
    M, K = x8.shape
    K2, N = w8.shape
    assert K == K2, (x8.shape, w8.shape)
    b = jnp.zeros((1, N), jnp.float32) if bias is None else bias.reshape(1, N)
    bm = block_m or _pick_block_m(M, N, K)
    # pad M up so the grid covers all rows (tail rows are row-independent)
    Mp = ((M + bm - 1) // bm) * bm
    xp = x8 if Mp == M else jnp.pad(x8, ((0, Mp - M), (0, 0)))
    sp = sx if Mp == M else jnp.pad(sx, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        _w8a8_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, sp, w8, sw, b)
    return out[:M] if Mp != M else out


_ACTIVATIONS = {
    "none": lambda x: x,
    # IN-KERNEL approximation: Mosaic has no erf/erfc lowering, so "gelu"
    # uses the tanh form inside kernels (|err| <= 3e-4 on bf16 activations;
    # serving-path argmax parity vs the exact-gelu einsum path measured
    # 1.0000 on chip). The XLA paths (models/encoder.py ACT2FN) use the
    # exact erf form per HF semantics.
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def rowquant_in_kernel(x, pl_mod):
    """Row absmax int8 quantization inside a Pallas kernel (shared by the
    fused attention/MLP block kernels). Returns (int8, f32 (M, 1) scale)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    s = jnp.maximum(absmax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(
        jnp.round(xf * pl_mod.reciprocal(s, approx=False)), -127, 127
    )
    return q.astype(jnp.int8), s


def _w8a8_bf16in_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref, *, activation="none"):
    """Row-quantize the bf16 activation block in VMEM, then int8 dot.

    Avoids the separate XLA quantize pass + int8 staging in HBM that made
    the two-pass W8A8 path HBM-bound (measured: two-pass W8A8 LOST to bf16
    end-to-end, 700 vs 1140 windows/s, despite the faster matmul). The
    optional activation runs in the epilogue — an unfused GELU between two
    pallas calls costs a full HBM round-trip of the (M, 4H) tensor
    (profiled: 1.23 ms/layer at BERT-base/B=128)."""
    x8, sx = rowquant_in_kernel(x_ref[:], pl)
    acc = jnp.dot(x8, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * sw_ref[:] + b_ref[:]
    o_ref[:] = _ACTIVATIONS[activation](out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "interpret", "activation")
)
def w8a8_matmul_bf16in(
    x: Array,
    w8: Array,
    sw: Array,
    bias: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    interpret: bool = False,
    activation: str = "none",
) -> Array:
    """bf16/f32 (M, K) @ int8 (K, N) -> out_dtype (M, N), quantizing the
    activation rows on the fly inside the kernel (fused W8A8), with an
    optional fused epilogue activation (gelu/relu/silu)."""
    M, K = x.shape
    K2, N = w8.shape
    assert K == K2, (x.shape, w8.shape)
    b = jnp.zeros((1, N), jnp.float32) if bias is None else bias.reshape(1, N)
    bm = block_m or _pick_block_m(M, N, K)
    Mp = ((M + bm - 1) // bm) * bm
    xp = x if Mp == M else jnp.pad(x, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_w8a8_bf16in_kernel, activation=activation),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        # the f32 rowquant + i32 accumulator temporaries exceed the default
        # 16 MB scoped budget at bm=2048 (observed 18.06M at K=N=768)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w8, sw, b)
    return out[:M] if Mp != M else out


def w8a8_matmul_reference(x8, sx, w8, sw, bias=None, out_dtype=jnp.bfloat16):
    """Pure-XLA arithmetic twin of the kernel (oracle + CPU fallback)."""
    acc = jax.lax.dot_general(
        x8.astype(jnp.int32),
        w8.astype(jnp.int32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        out = out + bias.reshape(1, -1)
    return out.astype(out_dtype)


def quant_dense(
    x: Array,
    kernel: Array,
    bias: Optional[Array] = None,
    out_dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
    activation: str = "none",
) -> Array:
    """Drop-in dense layer on the W8A8 path: float x (..., K) @ f32 (K, N).

    Quantizes activations per-token and weights per-output-channel on the
    fly (both XLA-fused; weight quant is a few MB per matrix and CSE'd per
    forward). Off-TPU (CPU tests) it runs the same integer arithmetic
    through XLA so results match the kernel bit-for-bit.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = kernel.shape[-1]
    x2 = x.reshape(-1, K)
    w8, sw = quantize_colwise(kernel)
    if use_pallas:
        out = w8a8_matmul_bf16in(
            x2, w8, sw, bias, out_dtype=out_dtype, activation=activation
        )
    else:
        x8, sx = quantize_rowwise(x2)
        out = w8a8_matmul_reference(x8, sx, w8, sw, bias, out_dtype=out_dtype)
        out = _ACTIVATIONS[activation](out.astype(jnp.float32)).astype(out_dtype)
    return out.reshape(*lead, N)
