"""Pallas TPU kernel: fused int4-unpack + dequant + matmul for DECODE.

y = x @ dequant4(W).T where W is nibble-packed int4 with per-(out-channel,
input-group) scales (ops/quant.py int4 notes: split-half layout, group size
INT4_GROUP=128). Decode is HBM-bound on the frozen-weight read — the whole
point of this kernel is that the packed bytes are the ONLY weight traffic:
unpack and dequant happen in VMEM/registers, the dequantized planes are
never written back to HBM (the XLA reference q4_matmul_t_ref materialises
them, which costs MORE bandwidth than reading int8 directly).

Contrast with ops/pallas/q8_matmul.py (the documented negative result): that
kernel lost to XLA's dot_general because TRAINING matmuls are compute-bound
and XLA's MXU scheduling is better. Decode matmuls (T = batch*beams rows,
8-32) are bandwidth-bound, a regime XLA cannot reach at all for int4 since
it has no sub-byte weight path on this runtime (jnp.int4 jit args crash —
CLAUDE.md).

Grid: (O / O_T, K / 128), K innermost so the (T, O_T) fp32 accumulator
stays VMEM-resident across the input reduction. Each step reads one
(O_T, 128) packed tile = one 128-column input group per half-plane, so the
scale is a single (O_T, 1) vector per plane per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128  # packed-column tile == INT4_GROUP (one scale group per plane)


def _kernel(x_lo_ref, x_hi_ref, w4_ref, sl_ref, sh_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # int8 bytes sign-extend into int32; low nibble via mask, high nibble
    # via arithmetic shift — both then 4-bit sign-extended with (n^8)-8.
    p = w4_ref[...].astype(jnp.int32)
    lo = (jnp.bitwise_xor(jnp.bitwise_and(p, 0xF), 8) - 8)
    hi = (jnp.bitwise_xor(jnp.bitwise_and(jnp.right_shift(p, 4), 0xF), 8) - 8)
    wl = (lo.astype(jnp.float32) * sl_ref[...]).astype(jnp.bfloat16)
    wh = (hi.astype(jnp.float32) * sh_ref[...]).astype(jnp.bfloat16)

    acc = jax.lax.dot_general(
        x_lo_ref[...], wl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        x_hi_ref[...], wh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] += acc


def _pick_o_tile(o: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if o % cand == 0:
            return cand
    raise ValueError(f"out_dim {o} not a multiple of 8")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_matmul_t_2d(x2, w4, s4, interpret: bool = False):
    t, i = x2.shape
    o, k = w4.shape
    kg = k // LANE
    o_t = _pick_o_tile(o)
    t_pad = -t % 8
    if t_pad:
        x2 = jnp.pad(x2, ((0, t_pad), (0, 0)))
    x_lo, x_hi = x2[:, :k], x2[:, k:]

    out = pl.pallas_call(
        _kernel,
        grid=(o // o_t, kg),
        in_specs=[
            pl.BlockSpec((x2.shape[0], LANE), lambda oi, ki: (0, ki)),
            pl.BlockSpec((x2.shape[0], LANE), lambda oi, ki: (0, ki)),
            pl.BlockSpec((o_t, LANE), lambda oi, ki: (oi, ki)),
            pl.BlockSpec((o_t, 1), lambda oi, ki: (oi, ki)),
            pl.BlockSpec((o_t, 1), lambda oi, ki: (oi, kg + ki)),
        ],
        out_specs=pl.BlockSpec((x2.shape[0], o_t), lambda oi, ki: (0, oi)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], o), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * i,
            bytes_accessed=o * k + 2 * t * i + 4 * t * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, w4, s4.astype(jnp.float32), s4.astype(jnp.float32))
    return out[:t]


def q4_matmul_t_pallas(x: jax.Array, w4: jax.Array, s4: jax.Array,
                       interpret: bool | None = None) -> jax.Array:
    """x: (..., I) bf16-compatible; w4: (O, I//2) packed int8; s4:
    (O, I//INT4_GROUP) fp32. Returns (..., O) in x.dtype."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    y = _q4_matmul_t_2d(x2, w4, s4, interpret=interpret)
    return y.reshape(*t_shape, w4.shape[0]).astype(x.dtype)
