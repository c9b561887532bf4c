"""Int8 frozen-weight matmul primitives for the SMT sparse phase.

SMT freezes ~99% of weights after conversion (reference smt.py:641-745);
frozen weights never change, so they can be quantized ONCE to int8 with
per-output-channel scales and every sparse-phase matmul that touches them
runs on the MXU's int8 path (~1.7x over bf16 at 8B widths, measured on
v5e — tools/int8_probe.py). The reference has no analogue: its frozen
weights stay fp16/bf16 (smt.py:366). Precedent for training through a
quantized frozen base: QLoRA (4-bit NF + LoRA); here it is int8 + exact
block corrections (ops/sparse_linear.py), strictly gentler.

Scales:
  * weights: per-output-channel symmetric, sw[o] = max|W[o,:]| / 127
  * activations: per-row (per-token) dynamic symmetric, computed in-graph
  * y = x @ W.T:  y[t,o] = (xq @ Wq.T)[t,o] * sx[t] * sw[o]
  * g @ W (grad_input) folds sw into g BEFORE quantization:
      (g @ W)[t,i] = sum_o g[t,o] sw[o] Wq[o,i] = (rowquant(g*sw) @ Wq) * sg
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_quant(x: jax.Array):
    """Per-row symmetric int8 quantization over the last dim.

    Returns (xq int8, sx fp32 with shape (..., 1)); x / sx rounded to
    [-127, 127]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8 for an (out, in) weight.

    Returns (wq int8 (O, I), sw fp32 (O,))."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)
    sw = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw[:, None]),
                  -127, 127).astype(jnp.int8)
    return wq, sw


def dequantize_weight(wq: jax.Array, sw: jax.Array, dtype=jnp.bfloat16):
    return (wq.astype(jnp.float32) * sw[:, None]).astype(dtype)


def q8_matmul_t(x: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """y = x @ dequant(Wq).T with dynamic per-row activation quantization.

    x: (..., I); wq: (O, I) int8; sw: (O,) fp32. Returns (..., O) in x.dtype.
    """
    xq, sx = row_quant(x)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)


def q8_matmul(g: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """grad_x = g @ dequant(Wq) (contraction over the OUT dim).

    Folds the per-out-channel scale into g before row quantization, so the
    int8 contraction is exact w.r.t. the folded values. g: (..., O);
    returns (..., I) in g.dtype."""
    gs = g.astype(jnp.float32) * sw
    gq, sg = row_quant(gs)
    y = jax.lax.dot_general(
        gq, wq, (((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sg).astype(g.dtype)


# ---------------------------------------------------------------------------
# Int4 (nibble-packed) frozen base — DECODE path
# ---------------------------------------------------------------------------
#
# Decode is HBM-bandwidth-bound on the frozen weight read (the 8B q8 decode
# streams ~7.5 GB/step at ~60% of the v5e's peak), so halving the bytes is
# the remaining big lever there; training matmuls are compute-bound (66-80%
# MXU util, tools/q8_epilogue_probe.py) and would NOT speed up, which is why
# int4 is decode-only. jnp.int4 arrays cannot be jit arguments on this
# runtime (axon RecursionError on S4 signatures — CLAUDE.md), so values are
# nibble-packed two-per-int8 and unpacked in-kernel (ops/pallas/q4_matmul.py)
# or in-graph (the XLA reference below).
#
# Scheme: symmetric int4 in [-7, 7] with per-(output-channel, input-group)
# fp32 scales, group size INT4_GROUP along the input dim — the per-group
# scales recover most of the quality per-channel int4 loses. Packing layout
# is SPLIT-HALF, not interleaved: packed column k holds original input
# columns k (low nibble) and k + I/2 (high nibble), so unpacking yields two
# contiguous column PLANES (no strided deinterleave on TPU) and
# y = x[:, :I/2] @ lo.T + x[:, I/2:] @ hi.T.
#
# The selected SMT blocks/columns still see their exact trained values:
# the dynamic-index corrections compute delta against base values gathered
# from THIS dequantized int4 base, so only the frozen remainder carries
# int4 noise (same argument as the q8 path, ops/sparse_linear.py notes).

INT4_GROUP = 128


def _sign_extend_nibble(n):
    """4-bit two's-complement -> signed int, any integer dtype: (n^8)-8."""
    return jnp.bitwise_xor(n, 8) - 8


def quantize_weight_int4(w: jax.Array, group: int | None = None):
    """(O, I) weight -> (w4 int8 (O, I//2) nibble-packed, s4 fp32
    (O, I // group) per-group scales). group defaults to INT4_GROUP when I
    allows it (every layer linear of the supported families does; the
    Pallas kernel requires exactly that), else the largest power-of-two
    divisor of I/2 (tiny test models — XLA reference path only)."""
    import math
    o, i = w.shape
    if group is None:
        group = (INT4_GROUP if i % (2 * INT4_GROUP) == 0
                 else math.gcd(INT4_GROUP, max(i // 2, 1)))
    g = group
    if i % (2 * g):
        raise ValueError(f"in_dim {i} not a multiple of {2 * g} — int4 "
                         "packing needs whole groups in each half-plane")
    wf = w.astype(jnp.float32).reshape(o, i // g, g)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    s4 = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / s4[..., None]), -7, 7)
    q = q.reshape(o, i).astype(jnp.int32)
    lo, hi = q[:, :i // 2], q[:, i // 2:]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(jnp.bitwise_and(hi, 0xF), 4))
    # values fit a byte (0..255); store as int8 (bit pattern preserved)
    return packed.astype(jnp.uint8).view(jnp.int8), s4


def unpack_int4(w4: jax.Array) -> jax.Array:
    """(O, K) packed int8 -> (O, 2K) int8 in ORIGINAL column order
    (low plane = cols [0, K), high plane = cols [K, 2K))."""
    p = w4.view(jnp.uint8).astype(jnp.int32)
    lo = _sign_extend_nibble(jnp.bitwise_and(p, 0xF))
    hi = _sign_extend_nibble(jnp.bitwise_and(jnp.right_shift(p, 4), 0xF))
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)


def dequantize_weight_int4(w4: jax.Array, s4: jax.Array,
                           dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the (O, I) weight from the packed int4 representation."""
    q = unpack_int4(w4)
    o, i = q.shape
    g = i // s4.shape[1]
    return (q.astype(jnp.float32).reshape(o, i // g, g)
            * s4[..., None]).reshape(o, i).astype(dtype)


def q4_matmul_t_ref(x: jax.Array, w4: jax.Array, s4: jax.Array) -> jax.Array:
    """XLA reference for y = x @ dequant4(W).T — numerics oracle for the
    Pallas kernel and the non-TPU fallback. Materialises the dequantized
    weight (no bandwidth win); the kernel never does.

    Computes against the FP32-dequantized weight (bf16 x values are exact
    in fp32): the same semantics as the Pallas kernel's integer-exact
    group dots with fp32 post-scales, and the same fp32 base the decode
    delta corrections are gathered against (requantize_scan_base_int4)."""
    w = dequantize_weight_int4(w4, s4, jnp.float32)
    return jnp.einsum("...i,oi->...o", x.astype(jnp.float32),
                      w).astype(x.dtype)


# Above this many rows the matmul is compute-bound and belongs on the MXU:
# dequantize the layer (a transient) and run a dense bf16 einsum instead of
# the VPU-unpacking Pallas kernel (profiled ~10x off MXU pace at p1024
# prefill — it is a decode-shape design). Decode calls are batch*beams
# rows (<= 32 in practice); prefill calls are batch*prompt (>= hundreds).
Q4_DECODE_MAX_ROWS = 64


def _q4_rows(x: jax.Array) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def q4_matmul_t(x: jax.Array, w4: jax.Array, s4: jax.Array) -> jax.Array:
    """y = x @ dequant4(W).T: fused unpack+dequant+matmul Pallas kernel on
    TPU at decode row counts (the bandwidth-bound regime the kernel is
    for), dequant + MXU einsum at prefill row counts, XLA reference when
    the shapes don't tile."""
    i2 = w4.shape[1]
    if (jax.devices()[0].platform == "tpu" and i2 % INT4_GROUP == 0
            and s4.shape[1] == 2 * (i2 // INT4_GROUP)
            and w4.shape[0] % 128 == 0):
        if _q4_rows(x) > Q4_DECODE_MAX_ROWS:
            w = dequantize_weight_int4(w4, s4, jnp.bfloat16)
            return jnp.einsum("...i,oi->...o", x.astype(jnp.bfloat16),
                              w).astype(x.dtype)
        from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import (
            q4_matmul_t_pallas)
        return q4_matmul_t_pallas(x, w4, s4)
    return q4_matmul_t_ref(x, w4, s4)


def q4_matmul_t_stacked(x: jax.Array, w4s: jax.Array, slt: jax.Array,
                        sht: jax.Array, layer, s4s=None) -> jax.Array:
    """y = x @ dequant4(W[layer]).T against a stacked (L, O, Kp) packed
    base with a TRACED layer index — the scan-over-layers decode form. The
    kernel indexes the stack via scalar prefetch so no per-layer weight
    copy materialises at the XLA level (ops/pallas/q4_matmul.py stacked
    notes). Callers build w4s/slt/sht once with pad_packed +
    build_scale_strips (eval/generate.decode_params_from_scan).

    At prefill row counts (> Q4_DECODE_MAX_ROWS) with s4s provided, the
    layer is dequantized to bf16 and run on the MXU instead (same rationale
    as q4_matmul_t; the transient weight is one layer, not the stack)."""
    if s4s is not None and _q4_rows(x) > Q4_DECODE_MAX_ROWS:
        w = dequantize_stacked_layer_int4(w4s, s4s, layer, jnp.bfloat16)
        return jnp.einsum("...i,oi->...o", x.astype(jnp.bfloat16),
                          w).astype(x.dtype)
    from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import (
        q4_matmul_t_stacked_pallas)
    return q4_matmul_t_stacked_pallas(x, w4s, slt, sht, layer)


def dequantize_stacked_layer_int4(w4s: jax.Array, s4s: jax.Array, layer,
                                  dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct layer `layer`'s (O, I) weight from a pad_packed stack
    (grad/fallback path only — materialises the dense weight)."""
    n = s4s.shape[-1]                       # 2 * kg (stacked => group 128)
    k = (n // 2) * INT4_GROUP
    w4 = jax.lax.dynamic_index_in_dim(w4s, layer, axis=0,
                                      keepdims=False)[:, :k]
    s4 = jax.lax.dynamic_index_in_dim(s4s, layer, axis=0, keepdims=False)
    return dequantize_weight_int4(w4, s4, dtype)
