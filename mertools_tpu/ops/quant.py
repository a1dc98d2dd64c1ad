"""Dynamic int8 quantized matmul (w8a8) for the extraction encoders.

TPU-native accelerator with no reference counterpart: the reference's
production numerics are torch TF32/fp16 on A100 (SURVEY.md §2.9 "CUDA
kernels"); on v5e the int8 MXU path doubles peak throughput over bf16
(~394 TOPS vs ~197 TFLOPS). This module provides a drop-in
``dot_general`` for ``flax.linen.Dense`` that

  1. quantizes the activation per-row (symmetric absmax over the
     contracted axis),
  2. quantizes the weight per-output-channel (symmetric absmax),
  3. runs the int8 x int8 -> int32 ``lax.dot_general`` (MXU int8 path),
  4. rescales back to the activation dtype.

Both quantizations happen inside the jitted forward: the weight pass is
O(K*N) against the matmul's O(M*K*N), so for extraction batches
(M = B*T in the tens of thousands) it is noise, and keeping the stored
params in bf16/f32 means one set of checkpoints serves every compute
mode.

Accuracy class: per-row dynamic activation scaling keeps the relative
error of a transformer-layer stack in the ~1e-2 range — the same class
as the bf16 production mode's documented 0.8% — so this is a
production/throughput mode, NOT for the <1e-3 feature-parity contract.

MEASURED (v5e, this repo's benchmarks): at the matmul level dynamic
w8a8 is 1.30x over bf16 (104 vs 81 TOPS at M=16k, K=N=4096 incl. both
dynamic quantizations); END-TO-END on HuBERT-large extraction (B=64 x
10 s) it is a WASH (1947 vs 1961 audio-s/s) — the encoder's VPU-bound
ops (softmax, GELU, LayerNorm, masking) and the quantize/rescale
passes absorb the MXU gain at these shapes. The mode is therefore OFF
by default and bf16 remains the production recommendation for
extraction; the dot_general hook exists for (a) future larger-M
workloads and (b) the weight-only int8 path below.

Weight-only int8 (``quantize_weight_w8`` + ``w8_einsum``) targets the
memory-bound LLM decode instead, where streaming the weights from HBM,
not FLOPs, is the bottleneck: MEASURED 1.56x decode throughput (1430
vs 916 tok/s) on a 1.4B-param LLM at batch 4 on v5e — the serving-mode
analogue of vLLM's quantized serving on the reference's GPUs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _absmax_scale(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.maximum(s, 1e-8)


def quantize_int8(x: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric absmax int8 quantization along ``axis``.

    Returns ``(q, scale)`` with ``x ~= q.astype(f32) * (scale / 127)``.
    """
    scale = _absmax_scale(x, axis)
    q = jnp.round(x.astype(jnp.float32) / scale * 127.0).astype(jnp.int8)
    return q, scale


def quantize_weight_w8(w: jnp.ndarray) -> dict:
    """Pack a 2-D kernel ``(K, N)`` (contraction over axis 0) as weight-only
    int8: ``{"q": int8 (K, N), "scale": f32 (N,)}`` with
    ``w ~= q.astype(f32) * scale``. Per-output-channel symmetric absmax."""
    s = _absmax_scale(w, axis=0) / 127.0          # (1, N)
    q = jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8)
    return {"q": q, "scale": s.reshape(-1).astype(jnp.float32)}


def w8_einsum(eq: str, x, kernel, precision=None):
    """Einsum against either a plain kernel array or a w8-packed dict.

    For packed kernels the int8->activation-dtype convert feeds the dot
    directly, so XLA streams the weights from HBM as int8 — halving the
    weight traffic that bounds small-batch autoregressive decode — and the
    per-column scale is applied to the (tiny) output."""
    if isinstance(kernel, dict):
        y = jnp.einsum(eq, x, kernel["q"].astype(x.dtype), precision=precision)
        return y * kernel["scale"].astype(y.dtype)
    return jnp.einsum(eq, x, kernel, precision=precision)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` substitute: dynamic w8a8 with int32 accumulation.

    Supports the ``nn.Dense`` contraction pattern (last axis of ``lhs``
    against first axis of ``rhs``, no batch dims). ``precision`` /
    ``preferred_element_type`` are accepted for signature compatibility
    and ignored — accumulation is always int32, output matches the
    activation dtype.
    """
    ((lc, rc), (lb, rb)) = dimension_numbers
    if (tuple(lb), tuple(rb)) != ((), ()) or tuple(lc) != (lhs.ndim - 1,) \
            or tuple(rc) != (0,):
        raise NotImplementedError(
            "int8_dot_general only supports the Dense contraction pattern")
    out_dtype = lhs.dtype
    ql, ls = quantize_int8(lhs, axis=-1)          # (..., K), (..., 1)
    qr, rs = quantize_int8(rhs, axis=0)           # (K, N),  (1, N)
    acc = jax.lax.dot_general(ql, qr, dimension_numbers,
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (ls / 127.0) * (rs / 127.0)
    return out.astype(out_dtype)
