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
