"""Pallas TPU kernel: GQA attention over the decode KV cache ("cached
fullk") — prefill chunks and incremental decode steps, bf16 or int8 cache.

Why the XLA einsum path loses here (profiled, tools/decode_profile.py):
  * prefill chunks materialise the fp32 score/prob tensors in HBM —
    (B, Hq, chunk, S) fp32 is 2.15 GB per chunk at b8/h32/c512/s4k, and the
    softmax chain re-reads them: ~1.0 s of a 1.7 s p3968 prefill. Past 4096
    slots the buffer also crashes the axon AOT compile helper.
  * decode steps pay XLA-level cache movement (slice/copy) and skinny
    (rows<=32, S=thousands) einsums far off the DMA rate.
  * an int8-quantized cache (models/llama.init_cache dtype int8) pays an
    elementwise dequant of the WHOLE cache per step at the XLA level —
    measured throughput-NEUTRAL, despite halving the bytes.

Like the training fullk kernel (ops/pallas/attention.py), the whole K/V of
one (batch, kv-head) stays VMEM-resident (S*hd*2B = 2.1 MB at s8192) and
scores live only in VMEM. On top of that, this kernel:
  * reads the cache IN PLACE in its storage layout ((B, Hkv, S, hd) —
    Hkv ahead of (S, hd) because Mosaic constrains the last two block
    dims); the (L, ...) stacked scan form is indexed at the traced layer
    via scalar prefetch (same trick as ops/pallas/q4_matmul.py: pallas
    operands cannot fuse a dynamic-slice producer, so XLA-level slicing
    copies the cache);
  * masks causality + left-padding in-kernel from (slot_mask, cache_index)
    iota arithmetic — the (B, T, S) fp32 mask_bias tensor never exists;
  * dequantizes an int8 cache by scaling score/prob COLUMNS: the group dot
    runs against the raw int8 payloads (converted in-register) and
    y_j = (q . k_j) * ks_j, p'_j = p_j * vs_j — R*S multiplies instead of
    S*hd, so the int8 cache's halved DMA finally nets out positive.

Semantics match models.llama._cached_layer's einsum path exactly (same
mask, fp32 softmax); parity: tests/test_cached_attention.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# fp32 score temporaries per program: rows x S. Budget keeps K+V blocks
# (2x 2.1 MB at s8192) + scores + q/out under the ~16 MB v5e VMEM.
_SCORE_BUDGET = 4 * 1024 * 1024


def _pick_block_r(rows: int, s: int, g: int) -> int:
    # rows are token-major (r = t*g + gi): blocks must hold whole tokens
    # (multiple of g) and whole sublanes (multiple of 8)
    unit = 8 * g // math.gcd(8, g)
    br = 256
    while br > unit and br * s * 4 > _SCORE_BUDGET:
        br //= 2
    br = max(unit, (br // unit) * unit)
    rows_pad = rows + (-rows % unit)
    return min(br, rows_pad)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mask(scal_ref, ri: int, block_r: int, g: int, sm_row, shape):
    """Visibility of slot j to q row r: j <= cache_index + token(r) AND
    slot_mask[j]. token(r) = (ri*block_r + r) // g (token-major rows)."""
    ci = scal_ref[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    slots = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    token = (ri * block_r + rows) // g
    return (slots <= ci + token) & (sm_row > 0)


def _kernel(scal_ref, q_ref, k_ref, v_ref, sm_ref, o_ref, *,
            sm_scale, g, block_r):
    q = q_ref[0, 0]                      # (block_r, hd)
    k = k_ref[0].astype(q.dtype)         # (S, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    keep = _mask(scal_ref, pl.program_id(2), block_r, g,
                 sm_ref[0, 0][None, :], s.shape)
    p = _softmax_rows(jnp.where(keep, s, NEG_INF))
    o = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0].astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _kernel_q8(scal_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, sm_ref, o_ref,
               *, sm_scale, g, block_r):
    q = q_ref[0, 0]
    k = k_ref[0].astype(q.dtype)         # raw int8 payloads -> q dtype
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # column dequant: (q . k_j) * ks_j == q . (k_j * ks_j); R*S multiplies
    s = s * ks_ref[0, 0][None, :] * sm_scale
    keep = _mask(scal_ref, pl.program_id(2), block_r, g,
                 sm_ref[0, 0][None, :], s.shape)
    p = _softmax_rows(jnp.where(keep, s, NEG_INF))
    p = p * vs_ref[0, 0][None, :]        # fold V scales into the probs
    o = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0].astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def supported(hd: int, max_len: int, hq: int, hkv: int) -> bool:
    """Shape conformance for the kernel (lane-dim tiling + whole-token row
    blocks). The einsum path stays the fallback everywhere else."""
    return hd % 128 == 0 and max_len % 128 == 0 and hq % hkv == 0


@functools.partial(jax.jit,
                   static_argnames=("g", "sm_scale", "interpret"))
def _cached_attn_call(q4, kc, vc, ks, vs, sm, scal, *, g, sm_scale,
                      interpret):
    b, hkv, r, hd = q4.shape
    s_len = kc.shape[3]
    block_r = _pick_block_r(r, s_len, g)
    r_pad = -r % block_r
    if r_pad:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, r_pad), (0, 0)))
    nr = q4.shape[2] // block_r
    quant = ks is not None

    # K/V: (L, B, Hkv, S, hd) — Mosaic constrains only the last two block
    # dims, so Hkv must sit ahead of (S, hd) to be squeezable per program
    kv_spec = pl.BlockSpec((None, 1, None, s_len, hd),
                           lambda bi, hi, ri, sc: (sc[0], bi, hi, 0, 0))
    # scales: (L, B, Hkv, 1, S) -> (1, S) lane blocks
    sc_spec = pl.BlockSpec((None, 1, None, 1, s_len),
                           lambda bi, hi, ri, sc: (sc[0], bi, hi, 0, 0))
    in_specs = [
        pl.BlockSpec((1, 1, block_r, hd),
                     lambda bi, hi, ri, sc: (bi, hi, ri, 0)),
        kv_spec, kv_spec,
    ]
    args = [q4, kc, vc]
    kern = _kernel
    if quant:
        in_specs += [sc_spec, sc_spec]
        args += [ks, vs]
        kern = _kernel_q8
    in_specs.append(pl.BlockSpec((1, 1, s_len),
                                 lambda bi, hi, ri, sc: (bi, 0, 0)))
    args.append(sm)

    out = pl.pallas_call(
        functools.partial(kern, sm_scale=sm_scale, g=g, block_r=block_r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv, nr),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, block_r, hd),
                                   lambda bi, hi, ri, sc: (bi, hi, ri, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q4.shape, q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * q4.shape[2] * s_len * hd,
            bytes_accessed=(q4.size * 2 * q4.dtype.itemsize
                            + kc.size * kc.dtype.itemsize * 2),
            transcendentals=b * hkv * q4.shape[2] * s_len,
        ),
        interpret=interpret,
    )(scal, *args)
    return out[:, :, :r]


def cached_attention(q, kv, slot_mask, cache_index, layer=None,
                     interpret: bool | None = None):
    """Attention over the decode KV cache.

    q: (B, T, HQ, hd) — new tokens' rope'd queries;
    kv: cache dict {"k","v"[,"ks","vs"]} — per-layer (B, Hkv, S, hd) leaves
        (layer=None) or the stacked (L, B, Hkv, S, hd) scan form with a
        traced `layer` index; int8 caches carry (..., Hkv, 1, S) scale
        leaves (models/llama.init_cache);
    slot_mask: (B, S) int — 1 for attendable slots;
    cache_index: traced or static int — first slot of the T new tokens.

    Returns (B, T, HQ, hd) in q.dtype. The new tokens' K/V must already be
    written into `kv` (models/llama._kv_write runs first)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, t, hq, hd = q.shape
    stacked = kv["k"].ndim == 5
    kc, vc = kv["k"], kv["v"]
    ks, vs = kv.get("ks"), kv.get("vs")
    if not stacked:
        # lift to a 1-layer stack (metadata-only reshape)
        kc, vc = kc[None], vc[None]
        ks = ks[None] if ks is not None else None
        vs = vs[None] if vs is not None else None
        layer = 0
    hkv = kc.shape[2]
    g = hq // hkv
    # token-major rows: row r = t*g + gi, head h = kv_head*g + gi
    q4 = (q.reshape(b, t, hkv, g, hd)
           .transpose(0, 2, 1, 3, 4)
           .reshape(b, hkv, t * g, hd))
    scal = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(cache_index, jnp.int32)])
    sm3 = jnp.asarray(slot_mask, jnp.int32)[:, None, :]
    out = _cached_attn_call(
        q4, kc, vc, ks, vs, sm3, scal,
        g=g, sm_scale=1.0 / math.sqrt(hd), interpret=interpret)
    return (out.reshape(b, hkv, t, g, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(b, t, hq, hd)).astype(q.dtype)
