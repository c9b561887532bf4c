"""Pallas TPU kernel: int8 frozen-weight matmul with fused scaling epilogue.

The XLA form of q8_matmul_t (ops/quant.py) is
    y_i32 = xq @ Wq.T            (int8 MXU dot, int32 out)
    y     = (y_i32 * sx * sw) -> bf16
If XLA emits the epilogue as a separate fusion, the (T, O) int32 product
round-trips HBM (4B write + 4B read per element) before the 2B bf16 write —
pure bandwidth the MXU never needed. This kernel keeps the int32 accumulator
in VMEM across the K reduction and applies the per-row (sx) and per-column
(sw) scales in the same pass, writing bf16 directly.

Row quantization of the activation stays in XLA (one fused amax+quantize
pass over x): the per-row scale needs the full row before any tile can be
quantized, so fusing it here would force a second K sweep.

Grid: (T/BT, O/BO, K/BK), K innermost so the accumulator block stays
resident (same structure as ops/pallas/block_grad.py). Falls back to the
XLA path when shapes don't tile (ops/quant.py dispatches).

Reference economics: the reference's frozen weights stay fp16/bf16 and all
its matmuls ride cuBLAS (smt.py:366); the int8 frozen base and this fused
epilogue have no reference analogue — they are TPU-native wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 512   # rows (tokens) per tile (preferred)
BO = 512   # output channels per tile (preferred)
BK = 1024  # contraction depth per tile (preferred)


def _pick(dim: int, preferred: int, floor: int = 256):
    """Largest power-of-two tile <= preferred that divides dim (>= floor);
    None if nothing fits. Keeps the kernel applicable to O=32000 (vocab,
    % 512 != 0 but % 256 == 0) and Llama-3's 128256."""
    t = preferred
    while t >= floor:
        if dim % t == 0:
            return t
        t //= 2
    return None


def _tiles(t: int, o: int, k: int):
    bt, bo, bk = _pick(t, BT), _pick(o, BO), _pick(k, BK)
    if bt is None or bo is None or bk is None:
        return None
    return bt, bo, bk


def _kernel_t(xq_ref, wq_ref, sx_ref, sw_ref, out_ref, acc_ref):
    """out[i, j] tile of (xq @ wq.T) * sx * sw, K innermost."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], wq_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc_ref[...].astype(jnp.float32)
                        * sx_ref[...] * sw_ref[...]).astype(out_ref.dtype)


def _kernel_g(gq_ref, wq_ref, sg_ref, out_ref, acc_ref):
    """out[i, j] tile of (gq @ wq) * sg (per-row scale only; the per-out
    -channel sw was folded into g before quantization, see q8_matmul)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        gq_ref[...], wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc_ref[...].astype(jnp.float32)
                        * sg_ref[...]).astype(out_ref.dtype)


def supported_shape(t: int, o: int, k: int) -> bool:
    """The kernel handles exactly-tiling shapes; quant.py falls back to the
    XLA form otherwise (odd dims, tiny test models)."""
    return _tiles(t, o, k) is not None


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def q8mm_t_core(xq, sx, wq, sw, out_dtype=jnp.bfloat16):
    """(T, K) int8 @ (O, K) int8 -> (T, O) out_dtype, scaled by sx (T, 1)
    per row and sw (O,) per output channel."""
    t, k = xq.shape
    o = wq.shape[0]
    bt, bo, bk = _tiles(t, o, k)
    grid = (t // bt, o // bo, k // bk)
    return pl.pallas_call(
        _kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bo, bk), lambda i, j, kk: (j, kk)),
            pl.BlockSpec((bt, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bo), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bo), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bo), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * k,
            bytes_accessed=t * k + o * k + t * o * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, wq, sx, sw.reshape(1, o))


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def q8mm_g_core(gq, sg, wq, out_dtype=jnp.bfloat16):
    """(T, O) int8 @ (O, K) int8 -> (T, K) out_dtype, scaled by sg (T, 1)."""
    t, o = gq.shape
    k = wq.shape[1]
    bt, bo, bk = _tiles(t, k, o)  # out cols = k, contraction = o
    grid = (t // bt, k // bo, o // bk)
    return pl.pallas_call(
        _kernel_g,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bo), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bt, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bo), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bo), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * k,
            bytes_accessed=t * o + o * k + t * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(gq, wq, sg)


def q8_matmul_t_fused(x: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """Drop-in for ops.quant.q8_matmul_t on exactly-tiling shapes."""
    from sparse_matrix_tuning_tpu.ops.quant import row_quant
    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    xq, sx = row_quant(x2)
    y = q8mm_t_core(xq, sx, wq, sw, out_dtype=x.dtype)
    return y.reshape(*t_shape, wq.shape[0])


def q8_matmul_fused(g: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """Drop-in for ops.quant.q8_matmul on exactly-tiling shapes."""
    from sparse_matrix_tuning_tpu.ops.quant import row_quant
    t_shape = g.shape[:-1]
    g2 = g.reshape(-1, g.shape[-1])
    gs = g2.astype(jnp.float32) * sw
    gq, sg = row_quant(gs)
    y = q8mm_g_core(gq, sg, wq, out_dtype=g.dtype)
    return y.reshape(*t_shape, wq.shape[1])
