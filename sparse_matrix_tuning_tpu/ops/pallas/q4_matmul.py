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

SEMANTICS: the dot over each 128-column scale group is integer-exact
(bf16 x times small-int weights, fp32 accumulation) and the fp32 group
scale multiplies the group PARTIAL, i.e. y = sum_g (x_g @ q_g.T) * s_g.
This equals a matmul against the fp32-dequantized weight up to fp32
rounding — the same fp32 base the decode delta corrections are gathered
against (train/scan_phase.requantize_scan_base_int4), so selected blocks
stay exact. q4_matmul_t_ref computes the matching fp32 oracle.

Layout lessons baked in (first version was 2.6x SLOWER than the int8 path):
  * 128-lane K steps made grid steps tiny (64 KB DMA + two 8-row dots) and
    the call was overhead-bound at ~40 GB/s effective weight bandwidth. Now
    each grid step reads a (o_t, GROUPS*128) packed tile and unrolls the
    GROUPS group-dots in-kernel, with the row/out grid dims "parallel".
  * Per-WEIGHT fp32 dequant multiplies made the kernel VPU-bound (~10 VPU
    ops per nibble). Scaling the (rows, o_t) group partial instead is 128x
    fewer multiplies, and sign extension is two shifts per plane.
  * Mosaic rejects lane-dim blocks of width 1 (and <128), so per-group
    scales cannot ride as (o_t, 1) lane blocks; they ride TRANSPOSED as
    (GROUPS, o_t) sublane blocks instead — each step gets exactly its
    GROUPS scale rows with zero in-kernel selection work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128   # scale-group width == INT4_GROUP (one scale column per group)
GROUPS = 8   # scale groups unpacked per grid step (K tile = GROUPS * LANE)


def _kernel(x_lo_ref, x_hi_ref, w4_ref, sl_ref, sh_ref, out_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    p = w4_ref[...]   # (o_t, GROUPS*LANE) packed bytes
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(GROUPS):
        # per-group i32 widening keeps the transient at (o_t, LANE) — a
        # whole-tile widening would cost 4x the packed bytes in VMEM.
        pg = p[:, g * LANE:(g + 1) * LANE].astype(jnp.int32)
        # sign-extend each nibble with two shifts (low: <<28 >>28, high:
        # <<24 >>28); the small ints are exact in bf16.
        wl = jnp.right_shift(jnp.left_shift(pg, 28), 28).astype(jnp.bfloat16)
        wh = jnp.right_shift(jnp.left_shift(pg, 24), 28).astype(jnp.bfloat16)
        al = jax.lax.dot_general(
            x_lo[:, g * LANE:(g + 1) * LANE], wl,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ah = jax.lax.dot_general(
            x_hi[:, g * LANE:(g + 1) * LANE], wh,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        acc += al * sl_ref[g][None, :] + ah * sh_ref[g][None, :]
    out_ref[...] += acc


def _pick_o_tile(o: int, r_t: int) -> int:
    # decode (few rows): big out tiles — grid-step overhead dominates and
    # the x/out blocks are tiny. prefill (256-row tiles): cap at 512 so the
    # out block + transients fit VMEM.
    cands = (2048, 1024, 512, 256, 128, 64, 32, 16, 8) if r_t <= 32 else \
            (512, 256, 128, 64, 32, 16, 8)
    for cand in cands:
        if o % cand == 0:
            return cand
    raise ValueError(f"out_dim {o} not a multiple of 8")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_matmul_t_2d(x2, w4, s4, interpret: bool = False):
    t, i = x2.shape
    o, k = w4.shape
    kg = k // LANE
    k_t = GROUPS * LANE
    # rows tile: decode calls are 8-32 rows (one tile); prefill calls can be
    # batch*seq rows, which must be tiled or the x/out blocks blow VMEM.
    r_t = min(-(-t // 8) * 8, 256)
    o_t = _pick_o_tile(o, r_t)
    t_pad = -t % r_t
    if t_pad:
        x2 = jnp.pad(x2, ((0, t_pad), (0, 0)))
    x_lo, x_hi = x2[:, :k], x2[:, k:]
    # pad K to a whole number of K tiles (real model widths need none —
    # k=2048/7168 are multiples of 1024; tiny test shapes pay a copy).
    k_pad = -k % k_t
    if k_pad:
        x_lo = jnp.pad(x_lo, ((0, 0), (0, k_pad)))
        x_hi = jnp.pad(x_hi, ((0, 0), (0, k_pad)))
        w4 = jnp.pad(w4, ((0, 0), (0, k_pad)))
    ksteps = (k + k_pad) // k_t
    # scales ride transposed, one (GROUPS, o_t) sublane block per K step;
    # padded K groups get zero scales (their x columns are zero anyway).
    # The transposes are loop-invariant w.r.t. decode steps — XLA hoists
    # them out of the sampling while-loop, so the per-step traffic is the
    # same bytes as s4 itself (I/256 of the weight read).
    gp = ksteps * GROUPS - kg
    sl_t = jnp.pad(s4[:, :kg].astype(jnp.float32), ((0, 0), (0, gp))).T
    sh_t = jnp.pad(s4[:, kg:].astype(jnp.float32), ((0, 0), (0, gp))).T

    out = pl.pallas_call(
        _kernel,
        grid=(x_lo.shape[0] // r_t, o // o_t, ksteps),
        in_specs=[
            pl.BlockSpec((r_t, k_t), lambda ti, oi, ki: (ti, ki)),
            pl.BlockSpec((r_t, k_t), lambda ti, oi, ki: (ti, ki)),
            pl.BlockSpec((o_t, k_t), lambda ti, oi, ki: (oi, ki)),
            pl.BlockSpec((GROUPS, o_t), lambda ti, oi, ki: (ki, oi)),
            pl.BlockSpec((GROUPS, o_t), lambda ti, oi, ki: (ki, oi)),
        ],
        out_specs=pl.BlockSpec((r_t, o_t), lambda ti, oi, ki: (ti, oi)),
        out_shape=jax.ShapeDtypeStruct((x_lo.shape[0], o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * i,
            bytes_accessed=o * k + 2 * t * i + 4 * t * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, w4, sl_t, sh_t)
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


# ---------------------------------------------------------------------------
# Stacked-layer variant (scan-over-layers decode)
# ---------------------------------------------------------------------------
#
# Inside the decode scan over layers, slicing the per-layer weights at the
# XLA level materialises a full copy per layer per decode step — pallas
# custom-call operands cannot fuse their dynamic-slice producer the way a
# dot_general can (profiled: ~1.45 ms/step of `squeeze` copies at L=8,
# tools/decode_profile.py). So the stacked variant takes the WHOLE
# (L, O, K) stack plus the layer index as a scalar-prefetch operand and
# lets the kernel DMA exactly layer l's blocks: zero slicing at XLA level.
# The scan then carries only the layer index; the stacks are closed over.

def build_scale_strips(s4: jax.Array, k: int):
    """(O, 2*kg) fp32 scales -> transposed, K-tile-padded (S, O) strips
    (low, high) for the kernel's (GROUPS, o_t) sublane scale blocks.
    k = packed column count (defines kg and the K padding)."""
    kg = k // LANE
    ksteps = -(-k // (GROUPS * LANE))
    gp = ksteps * GROUPS - kg
    sl = jnp.pad(s4[:, :kg].astype(jnp.float32), ((0, 0), (0, gp))).T
    sh = jnp.pad(s4[:, kg:].astype(jnp.float32), ((0, 0), (0, gp))).T
    return sl, sh


def pad_packed(w4: jax.Array) -> jax.Array:
    """Pad the packed column dim to a whole number of K tiles (no-op for
    real model widths; tiny test shapes pay a one-time build copy)."""
    k = w4.shape[-1]
    k_pad = -k % (GROUPS * LANE)
    if k_pad:
        pads = [(0, 0)] * (w4.ndim - 1) + [(0, k_pad)]
        w4 = jnp.pad(w4, pads)
    return w4


def _kernel_stacked(l_ref, x_lo_ref, x_hi_ref, w4_ref, sl_ref, sh_ref,
                    out_ref):
    del l_ref  # consumed by the index maps
    _kernel(x_lo_ref, x_hi_ref, w4_ref, sl_ref, sh_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_stacked_2d(x2, w4s, slt, sht, layer, interpret: bool = False):
    t, i = x2.shape
    _, o, kp = w4s.shape          # K already tile-padded (pad_packed)
    k = i // 2                    # true packed columns (x defines them)
    k_t = GROUPS * LANE
    assert kp % k_t == 0, "stacked w4 must be pad_packed at build time"
    r_t = min(-(-t // 8) * 8, 256)
    t_pad = -t % r_t
    if t_pad:
        x2 = jnp.pad(x2, ((0, t_pad), (0, 0)))
    x_lo, x_hi = x2[:, :k], x2[:, k:]
    if kp != k:
        x_lo = jnp.pad(x_lo, ((0, 0), (0, kp - k)))
        x_hi = jnp.pad(x_hi, ((0, 0), (0, kp - k)))
    o_t = _pick_o_tile(o, r_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x_lo.shape[0] // r_t, o // o_t, kp // k_t),
        in_specs=[
            pl.BlockSpec((r_t, k_t), lambda ti, oi, ki, l: (ti, ki)),
            pl.BlockSpec((r_t, k_t), lambda ti, oi, ki, l: (ti, ki)),
            pl.BlockSpec((None, o_t, k_t), lambda ti, oi, ki, l: (l[0], oi, ki)),
            pl.BlockSpec((None, GROUPS, o_t), lambda ti, oi, ki, l: (l[0], ki, oi)),
            pl.BlockSpec((None, GROUPS, o_t), lambda ti, oi, ki, l: (l[0], ki, oi)),
        ],
        out_specs=pl.BlockSpec((r_t, o_t), lambda ti, oi, ki, l: (ti, oi)),
    )
    out = pl.pallas_call(
        _kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x_lo.shape[0], o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * i,
            bytes_accessed=o * k + 2 * t * i + 4 * t * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x_lo, x_hi, w4s, slt, sht)
    return out[:t]


def q4_matmul_t_stacked_pallas(x: jax.Array, w4s: jax.Array, slt: jax.Array,
                               sht: jax.Array, layer,
                               interpret: bool | None = None) -> jax.Array:
    """x: (..., I); w4s: (L, O, Kp) pad_packed int8; slt/sht: (L, S, O)
    build_scale_strips output; layer: traced int32. Returns (..., O)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    y = _q4_stacked_2d(x2, w4s, slt, sht, layer, interpret=interpret)
    return y.reshape(*t_shape, w4s.shape[1]).astype(x.dtype)
