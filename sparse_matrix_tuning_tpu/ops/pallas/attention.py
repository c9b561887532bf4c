"""Pallas TPU kernel: causal GQA attention with the full K/V row resident
in VMEM ("fullk") — a v5e-tuned replacement for XLA einsum attention in the
seq<=4096 training regime.

Why not stock flash: measured on v5e (tools/attn_tune.py,
tools/attn_in_model.py), XLA's einsum attention beats
jax.experimental.pallas.ops.tpu.flash_attention at seq 1024-4096 even with
tuned 512 blocks (bwd ~1.8x). But einsum materialises the fp32 score and
prob tensors in HBM (b*hq*s*s*4 bytes each — 1 GiB per layer at the bench
geometry), ~24ms of the 85ms wide-model forward. At training lengths the
whole K/V of one (batch, kv-head) is tiny (s*hd*2 bytes = 256 KiB at
s=1024), so instead of flash's online-softmax k-tiling we keep ALL keys in
VMEM and tile only over q:

  fwd  grid (b, hkv, g, s/bq):  S = Q_tile K^T (fp32, VMEM-only) -> mask ->
       softmax -> P V. No score/prob bytes ever touch HBM.
  bwd  ONE fused pass, same grid: recompute S,P from the VMEM-resident
       K row, then dP = dO V^T, dS = P(dP - rowsum(dP*P)),
       dQ = dS K   (written per tile),
       dK += dS^T Q, dV += P^T dO  (fp32 VMEM accumulators, written back
       once per (b, kv-head) when the revisited output block retires).
       Stock flash needs two passes (dq, dkv) with online-softmax
       bookkeeping; einsum's autodiff re-reads the HBM prob tensor.

No softmax statistics are saved between fwd and bwd (the full row is
recomputed exactly), so residuals are just (q, k, v) — the sparse phase
keeps none of the 1 GiB fp32 prob tensor alive, and full-FT remat gets the
same effect for free.

Semantics match models.llama._attention (causal + right-padding: pad keys
sit causally after every real query; pad-query rows are dropped by the loss
mask), which itself mirrors the reference's HF LlamaAttention usage
(reference deepspeed/fine_tune.py:119-131 via transformers). Parity:
tests/test_attention_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# fp32 VMEM temporaries per program: fwd holds ~2 (S, P), bwd ~4
# (S, P, dP, dS). Budget chosen so bwd fits comfortably under the v5e
# VMEM limit with double-buffered operand blocks.
_FWD_TEMP_BUDGET = 8 * 1024 * 1024
_BWD_TEMP_BUDGET = 8 * 1024 * 1024


def _pick_block_q(s_pad: int, n_temps: int, budget: int) -> int:
    bq = 512
    while bq > 128 and n_temps * bq * s_pad * 4 > budget:
        bq //= 2
    return min(bq, s_pad)


def _causal_mask(qi, block_q: int, shape, s_real: int):
    qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (qpos >= kpos) & (kpos < s_real)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q, s_real):
    q = q_ref[0, 0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * sm_scale
    mask = _causal_mask(pl.program_id(3), block_q, s.shape, s_real)
    p = _softmax_rows(jnp.where(mask, s, NEG_INF))
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                sm_scale, block_q, s_real):
    gi = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(jnp.logical_and(gi == 0, qi == 0))
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0, 0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * sm_scale
    mask = _causal_mask(qi, block_q, s.shape, s_real)
    p = _softmax_rows(jnp.where(mask, s, NEG_INF))

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0, 0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_ref[0, 0] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _layout(q, k, v):
    """(b,s,hq,hd) q + (b,s,hkv,hd) k/v -> kernel layout, padded.

    Returns q (b,hkv,g,s_qpad,hd), k/v (b,hkv,s_kpad,hd), plus dims. Head
    grouping matches _attention: head h = kv_head * g + group."""
    b, s, hq, hd = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qk = q.reshape(b, s, hkv, g, hd).transpose(0, 2, 3, 1, 4)
    kk = k.transpose(0, 2, 1, 3)
    vk = v.transpose(0, 2, 1, 3)
    s_kpad = -s % 128
    if s_kpad:
        kk = jnp.pad(kk, ((0, 0), (0, 0), (0, s_kpad), (0, 0)))
        vk = jnp.pad(vk, ((0, 0), (0, 0), (0, s_kpad), (0, 0)))
    return qk, kk, vk, (b, s, hkv, g, hd)


def _pad_q(qk, block_q: int):
    s = qk.shape[3]
    pad = -s % block_q
    if pad:
        qk = jnp.pad(qk, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return qk


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fullk_fwd_impl(q, k, v, sm_scale: float):
    qk, kk, vk, (b, s, hkv, g, hd) = _layout(q, k, v)
    s_kpad = kk.shape[2]
    block_q = _pick_block_q(s_kpad, 2, _FWD_TEMP_BUDGET)
    qk = _pad_q(qk, block_q)
    s_qpad = qk.shape[3]
    nq = s_qpad // block_q

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, block_q=block_q,
                          s_real=s),
        grid=(b, hkv, g, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, hd),
                         lambda bi, hi, gi, qi: (bi, hi, gi, qi, 0)),
            pl.BlockSpec((1, 1, s_kpad, hd),
                         lambda bi, hi, gi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_kpad, hd),
                         lambda bi, hi, gi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, block_q, hd),
                               lambda bi, hi, gi, qi: (bi, hi, gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qk.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * g * s_qpad * s_kpad * hd,
            bytes_accessed=(qk.size * 2 + kk.size + vk.size) * q.dtype.itemsize,
            transcendentals=b * hkv * g * s_qpad * s_kpad,
        ),
        interpret=_interpret(),
    )(qk, kk, vk)

    return out[:, :, :, :s].transpose(0, 3, 1, 2, 4).reshape(b, s, hkv * g, hd)


def _fullk_bwd_impl(q, k, v, dout, sm_scale: float):
    qk, kk, vk, (b, s, hkv, g, hd) = _layout(q, k, v)
    dok = _layout(dout, k, v)[0]
    s_kpad = kk.shape[2]
    block_q = _pick_block_q(s_kpad, 4, _BWD_TEMP_BUDGET)
    qk = _pad_q(qk, block_q)
    dok = _pad_q(dok, block_q)
    nq = qk.shape[3] // block_q

    q_spec = pl.BlockSpec((1, 1, 1, block_q, hd),
                          lambda bi, hi, gi, qi: (bi, hi, gi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, s_kpad, hd),
                           lambda bi, hi, gi, qi: (bi, hi, 0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, block_q=block_q,
                          s_real=s),
        grid=(b, hkv, g, nq),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct(qk.shape, q.dtype),
            jax.ShapeDtypeStruct(kk.shape, jnp.float32),
            jax.ShapeDtypeStruct(vk.shape, jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * hkv * g * qk.shape[3] * s_kpad * hd,
            bytes_accessed=2 * (qk.size * 2 + kk.size * 3) * q.dtype.itemsize,
            transcendentals=b * hkv * g * qk.shape[3] * s_kpad,
        ),
        interpret=_interpret(),
    )(qk, kk, vk, dok)

    dq = dq[:, :, :, :s].transpose(0, 3, 1, 2, 4).reshape(b, s, hkv * g, hd)
    dk = dk[:, :, :s].transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv[:, :, :s].transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fullk_attention(q, k, v, sm_scale: float):
    """Causal GQA attention. q: (B,S,Hq,hd); k/v: (B,S,Hkv,hd); returns
    (B,S,Hq,hd). Right-padding safe; no attention-prob dropout."""
    return _fullk_fwd_impl(q, k, v, sm_scale)


def _vjp_fwd(q, k, v, sm_scale: float):
    return _fullk_fwd_impl(q, k, v, sm_scale), (q, k, v)


def _vjp_bwd(sm_scale: float, res, g):
    q, k, v = res
    return _fullk_bwd_impl(q, k, v, g, sm_scale)


fullk_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fullk_supported_on_mesh(mesh, b: int, hq: int, hkv: int) -> bool:
    """Attention is local to (batch, head): the kernel runs under shard_map
    iff the mesh's batch axes divide B and `tensor` divides both head
    counts (megatron col-parallel q/k/v shard by head, parallel/mesh.py)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    bs = sizes.get("data", 1) * sizes.get("fsdp", 1)
    t = sizes.get("tensor", 1)
    return b % bs == 0 and hq % t == 0 and hkv % t == 0


def fullk_attention_spmd(q, k, v, sm_scale: float, mesh):
    """fullk_attention under a GSPMD mesh via shard_map: batch over
    (data, fsdp), heads over tensor — matching the activation shardings the
    megatron weight layout induces (parallel/mesh.py). Attention has no
    cross-batch/cross-head terms, so the body needs zero collectives;
    pallas_call itself has no SPMD partitioning rule, which is why the
    explicit shard_map (a bare call under jit would be all-gathered)."""
    from jax.sharding import PartitionSpec as P

    spec = P(("data", "fsdp"), None, "tensor", None)
    # pallas_call out_shapes carry no varying-mesh-axes info, so replication
    # checking must be off. The kwarg is check_vma on modern jax and
    # check_rep on the jax.experimental fallback — match per import site.
    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    f = shard_map(
        lambda q, k, v: fullk_attention(q, k, v, sm_scale), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, **kw)
    return f(q, k, v)
