"""Block-sparse linear layers as jax.custom_vjp primitives.

Semantics match reference deepspeed/smt/smt.py:302-413 (`linearZ`) and
:185-296 (`linearChannel`), redesigned for TPU:

  * forward is ONE dense MXU matmul `y = x @ W.T` — the reference also
    computes a dense forward (smt.py:366), but first re-scatters the
    trainable blocks into the dense weight on every call (smt.py:331-341).
    Here the dense weight already contains the current block values (the
    optimizer scatters once per step into a donated buffer), so forward
    has zero scatter overhead.
  * backward returns grad_weight ONLY for the selected 256x256 blocks
    (shape (n_blocks, 256, 256)) — this is where SMT's FLOP/memory/comm
    savings come from. grad_input is the unavoidable dense `g @ W`.
  * two interchangeable grad-blocks implementations:
      "oracle": gather row/col panels with XLA slices + one batched einsum
                (numerics reference, runs everywhere);
      "pallas": a Pallas kernel that streams the panels through VMEM and
                never materialises the gathered copies in HBM
                (ops/pallas/block_grad.py).

The channel variant deliberately fixes a reference incoherence: the
reference trains *rows* of W indexed by selected *input*-channel indices
(smt.py:199-210), which only type-checks for square weights. Here the
selected input channels train the corresponding *columns* W[:, c], with
grad_cols = sum_batch(g^T @ x[:, :, c]) — coherent for every shape.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan, key_str


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    platform = jax.devices()[0].platform
    return "pallas" if platform == "tpu" else "oracle"


# ---------------------------------------------------------------------------
# Matrix (256x256 block) sparsity
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _smt_linear(lp: LinearPlan, impl: str, x, blocks, w):
    del lp, impl, blocks  # blocks already live inside w (scatter-at-update invariant)
    return jnp.einsum("...i,oi->...o", x, w)


def _smt_linear_fwd(lp, impl, x, blocks, w):
    y = jnp.einsum("...i,oi->...o", x, w)
    # zero-size residual carries the trainable dtype through tracing
    return y, (x, w, jnp.zeros((0,), blocks.dtype))


def _smt_linear_bwd(lp: LinearPlan, impl: str, res, g):
    x, w, dtype_probe = res
    blocks_dtype = dtype_probe.dtype
    grad_x = jnp.einsum("...o,oi->...i", g, w)

    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    if _resolve_impl(impl) == "pallas":
        from sparse_matrix_tuning_tpu.ops.pallas.block_grad import block_grad_weight
        grad_blocks = block_grad_weight(g2, x2, lp.row_blocks(), lp.col_blocks())
    else:
        grad_blocks = _block_grad_weight_xla(lp, g2, x2)
    return grad_x, grad_blocks.astype(blocks_dtype), jnp.zeros_like(w)


def _block_grad_weight_xla(lp: LinearPlan, g2, x2):
    """grad_blocks[i] = g[:, rb_i]^T @ x[:, cb_i]  — (n, 256, 256) in fp32.

    Reference semantics: smt.py:382-404 (per block, sum over batch). The
    gathered row/col panels are formed with static slices and contracted in
    one batched MXU matmul.
    """
    t = g2.shape[0]
    rb = jnp.asarray(lp.row_blocks())
    cb = jnp.asarray(lp.col_blocks())
    # single vectorised gathers (per-block slice loops would emit thousands
    # of ops at large block counts)
    g_rows = jnp.take(g2.reshape(t, -1, BLOCK), rb, axis=1).transpose(1, 0, 2)
    x_cols = jnp.take(x2.reshape(t, -1, BLOCK), cb, axis=1).transpose(1, 0, 2)
    return jax.lax.dot_general(
        g_rows, x_cols,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


_smt_linear.defvjp(_smt_linear_fwd, _smt_linear_bwd)


def smt_linear(x, blocks, w, lp: LinearPlan, impl: str = "oracle"):
    """y = x @ W.T with gradients routed to the selected blocks only.

    x: (..., in_dim); blocks: (n_blocks, 256, 256) trainable (fp32 master);
    w: (out_dim, in_dim) dense weight ALREADY containing the current block
    values. Gradient w.r.t. w is zero (it is frozen)."""
    return _smt_linear(lp, impl, x, blocks, w)


# ---------------------------------------------------------------------------
# Matrix sparsity over an int8 frozen base (TPU fast path)
# ---------------------------------------------------------------------------
#
# After conversion the dense weight is FROZEN except for the selected
# blocks, so it is quantized once to int8 (ops/quant.py) and the sparse
# phase computes
#
#   y      = q8(x) @ Wq.T * sx * sw  +  sum_j  x[:, cb_j] @ delta_j.T
#   grad_x = q8(g*sw) @ Wq * sg      +  sum_j  g[:, rb_j] @ delta_j
#   delta_j = blocks_j - base_j,   base_j = dequant(Wq)[rb_j, cb_j]  (static)
#
# The correction term makes the SELECTED blocks see zero quantization error
# (W_eff[rb,cb] = base + blocks - base = blocks exactly); only the frozen
# 99% carries int8 noise, computed on the MXU's 2x int8 path (~1.7x
# measured at 8B widths, tools/int8_probe.py). grad_blocks is the same
# exact bf16 formula as the bf16 path. No reference analogue (the
# reference's frozen weights stay fp16/bf16, smt.py:366); precedent for
# training through a quantized frozen base: QLoRA (4-bit + LoRA).

def _zero_cotangent(x):
    """Cotangent for a frozen primal: float0 for int/bool dtypes (jax's
    tangent type for them), zeros otherwise. Both are DCE'd — the trainer
    only differentiates w.r.t. the trainable blocks."""
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


@lru_cache(maxsize=None)
def _block_groups(blocks: tuple, by: str):
    """Group block indices by unique row-block ("r") / col-block ("c"):
    {group_id: (block_positions tuple, other_coord tuple)}. Static per plan;
    lets the correction run as ONE matmul + one contiguous slice-add per
    group instead of an XLA scatter (scatters serialize on TPU and were
    eating the whole q8 win — ~1.5ms/linear measured)."""
    groups: dict = {}
    for j, (r, c) in enumerate(blocks):
        key, other = (r, c) if by == "r" else (c, r)
        groups.setdefault(key, ([], []))
        groups[key][0].append(j)
        groups[key][1].append(other)
    return {k: (tuple(v[0]), tuple(v[1])) for k, v in sorted(groups.items())}


def _grouped_correction(out2, other2, delta, blocks: tuple, by: str,
                        transpose_delta: bool):
    """out2[:, G*256:(G+1)*256] += sum_j other2[:, o_j*256:+256] @ D_j for
    each block j in group G, where D_j = delta[j].T (forward, by="r") or
    delta[j] (grad_input, by="c"). All indices static."""
    for gid, (js, others) in _block_groups(blocks, by).items():
        parts = [jax.lax.slice_in_dim(other2, o * BLOCK, (o + 1) * BLOCK, axis=1)
                 for o in others]
        src = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        dg = delta[jnp.asarray(js)]                    # (k, 256, 256)
        if transpose_delta:
            dg = dg.transpose(0, 2, 1)                 # rows of W -> per-col
        wgt = dg.reshape(-1, BLOCK)                    # (k*256, 256)
        corr = jax.lax.dot_general(
            src, wgt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (T, 256)
        sl = jax.lax.slice_in_dim(out2, gid * BLOCK, (gid + 1) * BLOCK, axis=1)
        upd = (sl.astype(jnp.float32) + corr).astype(out2.dtype)
        out2 = jax.lax.dynamic_update_slice_in_dim(out2, upd, gid * BLOCK, axis=1)
    return out2


# Correction strategy for the UNROLLED q8 path. Swept in situ on the v5e
# (SMT_Q8_CORR={grouped,dyn,batched} x tools/q8_step_probe.py 3, 8B-width
# L=3, bs8/seq1024, offload off): f+b grouped 164.9ms / dyn 184.6ms /
# batched 204.7ms — grouped (one matmul + contiguous slice-add per unique
# out-block group) wins; the batched single-dot_general variant loses to
# the (n,T,256) gather/transpose it needs. Default stays grouped;
# SMT_Q8_CORR overrides for measurement and tests.
def _q8_corr_impl() -> str:
    import os
    return os.environ.get("SMT_Q8_CORR", "grouped")


def _batched_correction(out2, src2, delta, blocks: tuple, by: str):
    """All block corrections in ONE batched MXU matmul, then one contiguous
    slice-add per UNIQUE out block (segment-summed when several blocks
    share it): panels = src2[:, i_j] gathered once -> (n, T, 256);
    corr = panels @ D_j -> (n, T, 256); out2[:, o_g] += sum_{j in g} corr_j.

    vs _grouped_correction (one matmul + concat per group) this turns G
    small matmuls into one batched call and drops the concat copies — but
    measured SLOWER in situ at 8B widths (f+b 204.7ms vs grouped's
    164.9ms, tools/q8_step_probe.py): the (n,T,256) panel gather +
    transpose costs more than the concats it removes. Kept for the
    SMT_Q8_CORR sweep, not the default."""
    idx_out = [(r if by == "r" else c) for r, c in blocks]
    idx_in = [(c if by == "r" else r) for r, c in blocks]
    t = src2.shape[0]
    panels = jnp.take(src2.reshape(t, -1, BLOCK),
                      jnp.asarray(idx_in, jnp.int32), axis=1
                      ).transpose(1, 0, 2)                     # (n, T, 256)
    mats = delta.transpose(0, 2, 1) if by == "r" else delta    # (n, 256, 256)
    corr = jax.lax.dot_general(
        panels, mats.astype(panels.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # (n, T, 256)
    groups: dict = {}
    for j, o in enumerate(idx_out):
        groups.setdefault(o, []).append(j)
    for o, js in sorted(groups.items()):
        add = corr[js[0]] if len(js) == 1 else corr[jnp.asarray(js)].sum(0)
        sl = jax.lax.slice_in_dim(out2, o * BLOCK, (o + 1) * BLOCK, axis=1)
        upd = (sl.astype(jnp.float32) + add).astype(out2.dtype)
        out2 = jax.lax.dynamic_update_slice_in_dim(out2, upd, o * BLOCK,
                                                   axis=1)
    return out2


def _q8_correction(out2, src2, delta, blocks: tuple, by: str):
    impl = _q8_corr_impl()
    if impl == "pallas":
        from sparse_matrix_tuning_tpu.ops.pallas.correction import (
            block_correction)
        io = tuple((r if by == "r" else c) for r, c in blocks)
        ii = tuple((c if by == "r" else r) for r, c in blocks)
        mats = delta.transpose(0, 2, 1) if by == "r" else delta
        return block_correction(out2, src2, mats, io, ii)
    if impl == "dyn":
        rb = jnp.asarray([r for r, _ in blocks], jnp.int32)
        cb = jnp.asarray([c for _, c in blocks], jnp.int32)
        if by == "r":
            return _dyn_correction(out2, src2, delta.transpose(0, 2, 1),
                                   rb, cb)
        return _dyn_correction(out2, src2, delta, cb, rb)
    if impl == "batched":
        return _batched_correction(out2, src2, delta, blocks, by)
    return _grouped_correction(out2, src2, delta, blocks, by,
                               transpose_delta=(by == "r"))


def _q8_forward(lp: LinearPlan, x, blocks, wq, sw, base_blocks):
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul_t
    y = q8_matmul_t(x, wq, sw)                      # (..., O)
    delta = (blocks - base_blocks).astype(x.dtype)  # (n, 256, 256)
    t_shape = x.shape[:-1]
    x2 = x.reshape(-1, lp.in_dim)
    y2 = y.reshape(-1, lp.out_dim)
    # y[:, rb] += x[:, cb] @ delta.T
    y2 = _q8_correction(y2, x2, delta, lp.blocks, by="r")
    return y2.reshape(*t_shape, lp.out_dim)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _smt_linear_q8(lp: LinearPlan, impl: str, x, blocks, wq, sw, base_blocks):
    del impl
    return _q8_forward(lp, x, blocks, wq, sw, base_blocks)


def _smt_linear_q8_fwd(lp, impl, x, blocks, wq, sw, base_blocks):
    y = _q8_forward(lp, x, blocks, wq, sw, base_blocks)
    delta = (blocks - base_blocks).astype(x.dtype)
    res = (x, wq, sw, delta, jnp.zeros((0,), blocks.dtype))
    return y, res


def _smt_linear_q8_bwd(lp: LinearPlan, impl: str, res, g):
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul
    x, wq, sw, delta, dtype_probe = res
    g2 = g.reshape(-1, lp.out_dim)
    x2 = x.reshape(-1, lp.in_dim)

    grad_x = q8_matmul(g2, wq, sw)                  # (T, I)
    # grad_x[:, cb] += g[:, rb] @ delta
    grad_x = _q8_correction(grad_x, g2, delta, lp.blocks,
                            by="c").reshape(x.shape)

    if _resolve_impl(impl) == "pallas":
        from sparse_matrix_tuning_tpu.ops.pallas.block_grad import block_grad_weight
        grad_blocks = block_grad_weight(g2, x2, lp.row_blocks(), lp.col_blocks())
    else:
        grad_blocks = _block_grad_weight_xla(lp, g2, x2)
    return (grad_x, grad_blocks.astype(dtype_probe.dtype),
            _zero_cotangent(wq), jnp.zeros_like(sw),
            jnp.zeros((len(lp.blocks), BLOCK, BLOCK), dtype_probe.dtype))


_smt_linear_q8.defvjp(_smt_linear_q8_fwd, _smt_linear_q8_bwd)


def smt_linear_q8(x, blocks, wq, sw, base_blocks, lp: LinearPlan,
                  impl: str = "auto"):
    """Block-sparse linear over an int8 frozen base (see module notes)."""
    return _smt_linear_q8(lp, impl, x, blocks, wq, sw, base_blocks)


@jax.custom_vjp
def frozen_q8_linear(x, wq, sw):
    """y = x @ dequant(Wq).T for a fully-frozen linear (no selected blocks,
    e.g. o_proj): int8 forward, int8 grad_input, no weight grad. The
    straight-through custom_vjp is required — autodiff through round/clip
    would yield zero input gradients."""
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul_t
    return q8_matmul_t(x, wq, sw)


def _frozen_q8_fwd(x, wq, sw):
    return frozen_q8_linear(x, wq, sw), (wq, sw)


def _frozen_q8_bwd(res, g):
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul
    wq, sw = res
    return q8_matmul(g, wq, sw), _zero_cotangent(wq), jnp.zeros_like(sw)


frozen_q8_linear.defvjp(_frozen_q8_fwd, _frozen_q8_bwd)


@jax.custom_vjp
def frozen_q4_linear(x, w4, s4):
    """y = x @ dequant4(W).T for a fully-frozen linear over the nibble-
    packed int4 base (decode path — see ops/quant.py int4 notes). Fused
    Pallas unpack-matmul on TPU; straight-through input gradient."""
    from sparse_matrix_tuning_tpu.ops.quant import q4_matmul_t
    return q4_matmul_t(x, w4, s4)


def _frozen_q4_fwd(x, w4, s4):
    return frozen_q4_linear(x, w4, s4), (w4, s4)


def _frozen_q4_bwd(res, g):
    from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight_int4
    w4, s4 = res
    w = dequantize_weight_int4(w4, s4, g.dtype)
    return (jnp.einsum("...o,oi->...i", g, w), _zero_cotangent(w4),
            jnp.zeros_like(s4))


frozen_q4_linear.defvjp(_frozen_q4_fwd, _frozen_q4_bwd)


@jax.custom_vjp
def frozen_q4_linear_stacked(x, w4s, slt, sht, s4s, l):
    """Stacked-layer twin of frozen_q4_linear for the scan decode: the
    (L, O, Kp) packed base is indexed at traced layer l inside the kernel
    (scalar prefetch), so the scan body never slices the weights."""
    from sparse_matrix_tuning_tpu.ops.quant import q4_matmul_t_stacked
    return q4_matmul_t_stacked(x, w4s, slt, sht, l, s4s=s4s)


def _frozen_q4s_fwd(x, w4s, slt, sht, s4s, l):
    return (frozen_q4_linear_stacked(x, w4s, slt, sht, s4s, l),
            (w4s, slt, sht, s4s, l))


def _frozen_q4s_bwd(res, g):
    from sparse_matrix_tuning_tpu.ops.quant import (
        dequantize_stacked_layer_int4)
    w4s, slt, sht, s4s, l = res
    w = dequantize_stacked_layer_int4(w4s, s4s, l, g.dtype)
    return (jnp.einsum("...o,oi->...i", g, w), _zero_cotangent(w4s),
            jnp.zeros_like(slt), jnp.zeros_like(sht), jnp.zeros_like(s4s),
            _zero_cotangent(l))


frozen_q4_linear_stacked.defvjp(_frozen_q4s_fwd, _frozen_q4s_bwd)


# ---------------------------------------------------------------------------
# Dynamic-index (scan-over-layers) matrix sparsity
# ---------------------------------------------------------------------------
#
# Inside a lax.scan over layers the selected block coordinates cannot be
# Python constants (they differ per layer), so this variant takes them as
# traced (n,) int32 arrays plus a validity mask (block lists are padded to
# the per-module max count; padded entries have delta forced to 0 and their
# grads masked). Both precisions share one formulation around a NEVER
# UPDATED frozen base:
#
#   y      = base_matmul(x, W_frozen)  +  x[:, cb_j] @ delta_j.T   at rows rb_j
#   grad_x = base_matmul_T(g)          +  g[:, rb_j] @ delta_j     at cols cb_j
#   delta_j = (blocks_j - base_blocks_j) * valid_j
#
# where base_matmul is the dense bf16 matmul (base_blocks = conversion-time
# block values) or the int8 q8_matmul (base_blocks = dequantized values) —
# so the scan path needs no per-step scatter into the dense weights at all.
# Corrections are sequential dynamic 256-column slice updates (contiguous,
# cheap on TPU) rather than index-array scatters (which serialize, see
# _grouped_correction notes).

def _dyn_correction_dispatch(out2, src2, delta_mats, idx_out, idx_in,
                             impl: str):
    """Traced-coordinate correction: fused Pallas kernel on TPU (sorted by
    out block — kernel precondition; duplicate-o runs stay VMEM-resident),
    sequential XLA chain elsewhere (interpret-mode Pallas is test-only).
    SMT_DYN_CORR=chain forces the old sequential form (A/B measurement)."""
    import os
    if os.environ.get("SMT_DYN_CORR") == "chain":
        return _dyn_correction(out2, src2, delta_mats, idx_out, idx_in)
    if _resolve_impl(impl) == "pallas":
        from sparse_matrix_tuning_tpu.ops.pallas.correction import (
            block_correction_dyn, sort_by_out)
        io, ii, dm = sort_by_out(idx_out, idx_in, delta_mats)
        return block_correction_dyn(out2, src2, dm, io, ii)
    return _dyn_correction(out2, src2, delta_mats, idx_out, idx_in)


def _dyn_correction(out2, src2, delta_mats, idx_out, idx_in):
    """out2[:, o_j*256:+256] += src2[:, i_j*256:+256] @ delta_mats[j], with
    o = idx_out, i = idx_in traced. Sequential over the (small, static)
    padded block count; duplicate idx_out entries chain correctly."""
    n = delta_mats.shape[0]
    for j in range(n):
        src = jax.lax.dynamic_slice_in_dim(src2, idx_in[j] * BLOCK, BLOCK,
                                           axis=1)
        corr = jax.lax.dot_general(src, delta_mats[j], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cur = jax.lax.dynamic_slice_in_dim(out2, idx_out[j] * BLOCK, BLOCK,
                                           axis=1)
        upd = (cur.astype(jnp.float32) + corr).astype(out2.dtype)
        out2 = jax.lax.dynamic_update_slice_in_dim(out2, upd,
                                                   idx_out[j] * BLOCK, axis=1)
    return out2


def _base_matmul(x, wq_or_w):
    if "w4s" in wq_or_w:
        # stacked int4 decode base: traced layer index, scalar-prefetch
        # block indexing — no per-layer weight copy at the XLA level
        # (s4s routes prefill row counts to dequant + MXU)
        from sparse_matrix_tuning_tpu.ops.quant import q4_matmul_t_stacked
        return q4_matmul_t_stacked(x, wq_or_w["w4s"], wq_or_w["slt"],
                                   wq_or_w["sht"], wq_or_w["l"],
                                   s4s=wq_or_w.get("s4s"))
    if "w4" in wq_or_w:
        from sparse_matrix_tuning_tpu.ops.quant import q4_matmul_t
        return q4_matmul_t(x, wq_or_w["w4"], wq_or_w["s4"])
    if "wq" in wq_or_w:
        from sparse_matrix_tuning_tpu.ops.quant import q8_matmul_t
        return q8_matmul_t(x, wq_or_w["wq"], wq_or_w["sw"])
    return jnp.einsum("...i,oi->...o", x, wq_or_w["w"])


def _base_matmul_T(g, wq_or_w):
    # int4 is a DECODE-only base (training is compute-bound — CLAUDE.md);
    # the grad paths exist for completeness and materialise the
    # dequantized weight (off the hot path by construction).
    if "w4s" in wq_or_w:
        from sparse_matrix_tuning_tpu.ops.quant import (
            dequantize_stacked_layer_int4)
        w = dequantize_stacked_layer_int4(wq_or_w["w4s"], wq_or_w["s4s"],
                                          wq_or_w["l"], g.dtype)
        return jnp.einsum("...o,oi->...i", g, w)
    if "w4" in wq_or_w:
        from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight_int4
        w = dequantize_weight_int4(wq_or_w["w4"], wq_or_w["s4"], g.dtype)
        return jnp.einsum("...o,oi->...i", g, w)
    if "wq" in wq_or_w:
        from sparse_matrix_tuning_tpu.ops.quant import q8_matmul
        return q8_matmul(g, wq_or_w["wq"], wq_or_w["sw"])
    return jnp.einsum("...o,oi->...i", g, wq_or_w["w"])


def _dyn_delta(blocks, base_blocks, valid, dtype):
    return ((blocks - base_blocks)
            * valid.astype(blocks.dtype)[:, None, None]).astype(dtype)


def _dyn_forward(x, blocks, rb, cb, valid, frozen, base_blocks,
                 impl: str = "auto"):
    y = _base_matmul(x, frozen)
    delta = _dyn_delta(blocks, base_blocks, valid, x.dtype)
    t_shape = x.shape[:-1]
    y2 = _dyn_correction_dispatch(y.reshape(-1, y.shape[-1]),
                                  x.reshape(-1, x.shape[-1]),
                                  delta.transpose(0, 2, 1), rb, cb, impl)
    return y2.reshape(*t_shape, y.shape[-1])


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def smt_linear_dyn(impl: str, x, blocks, rb, cb, valid, frozen, base_blocks):
    """Block-sparse linear with traced block coordinates (scan path).

    frozen: {"w": (O, I)} bf16 dense or {"wq": int8, "sw": fp32} q8 base —
    NEVER updated during the sparse phase. blocks/base_blocks: (n, 256,
    256); rb/cb: (n,) int32; valid: (n,) bool."""
    return _dyn_forward(x, blocks, rb, cb, valid, frozen, base_blocks, impl)


def _smt_linear_dyn_fwd(impl, x, blocks, rb, cb, valid, frozen, base_blocks):
    y = _dyn_forward(x, blocks, rb, cb, valid, frozen, base_blocks, impl)
    delta = _dyn_delta(blocks, base_blocks, valid, x.dtype)
    return y, (x, rb, cb, valid, frozen, delta,
               jnp.zeros((0,), blocks.dtype))


def _smt_linear_dyn_bwd(impl: str, res, g):
    x, rb, cb, valid, frozen, delta, dtype_probe = res
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])

    grad_x = _base_matmul_T(g2, frozen)
    grad_x = _dyn_correction_dispatch(grad_x, g2, delta, cb, rb,
                                      impl).reshape(x.shape)

    if _resolve_impl(impl) == "pallas":
        from sparse_matrix_tuning_tpu.ops.pallas.block_grad import (
            block_grad_weight_dyn)
        grad_blocks = block_grad_weight_dyn(g2, x2, rb, cb)
    else:
        grad_blocks = _block_grad_weight_xla_dyn(g2, x2, rb, cb)
    grad_blocks = (grad_blocks * valid.astype(grad_blocks.dtype)[:, None, None])
    return (grad_x, grad_blocks.astype(dtype_probe.dtype),
            _zero_cotangent(rb), _zero_cotangent(cb), _zero_cotangent(valid),
            jax.tree.map(_zero_cotangent, frozen),
            jnp.zeros_like(delta, dtype=dtype_probe.dtype))


smt_linear_dyn.defvjp(_smt_linear_dyn_fwd, _smt_linear_dyn_bwd)


def _block_grad_weight_xla_dyn(g2, x2, rb, cb):
    """XLA oracle with traced block indices (jnp.take gathers)."""
    t = g2.shape[0]
    g_rows = jnp.take(g2.reshape(t, -1, BLOCK), rb, axis=1).transpose(1, 0, 2)
    x_cols = jnp.take(x2.reshape(t, -1, BLOCK), cb, axis=1).transpose(1, 0, 2)
    return jax.lax.dot_general(
        g_rows, x_cols,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Dynamic-index (scan-over-layers) channel sparsity
# ---------------------------------------------------------------------------
#
# Channel twin of smt_linear_dyn: the trainable unit is whole COLUMNS of W
# (selected input channels, see channel-mode notes below), coordinates are
# traced (n,) int32 arrays padded to the per-module max with inert
# duplicates. Both precisions compute around a never-updated frozen base:
#
#   y       = base_matmul(x, W_frozen)  +  x[:, ci] @ delta.T
#   grad_x  = base_matmul_T(g)          +  (g @ delta) scattered to cols ci
#   grad_cols = g^T @ x[:, ci]                       (masked by `valid`)
#   delta   = (cols - base_cols) * valid             — (O, n)
#
# With the int8 base, base_cols = dequant(Wq)[:, ci], so the SELECTED
# columns see zero quantization error (W_eff[:, ci] = cols exactly) — the
# column analogue of the q8 block correction above. The column gather uses
# jnp.take (vectorized gather); the grad_x column scatter uses a one-hot
# matmul (n x I) on the MXU instead of an XLA scatter (scatters serialize
# on TPU, see _grouped_correction notes). n*I MACs per token — negligible
# next to the O*I base matmul since n << O.
#
# This is what lets channel mode scale like matrix mode (VERDICT r2
# missing #3 / next-step #2): depth-independent compile via lax.scan +
# int8 frozen base + host offload. Reference semantics: smt.py:185-296
# (linearChannel), fine_tune.py:406-575.

def _chan_delta(cols, base_cols, valid, dtype):
    return ((cols - base_cols) * valid.astype(cols.dtype)[None, :]).astype(dtype)


def _chan_forward(x, cols, ci, valid, frozen, base_cols):
    y = _base_matmul(x, frozen)
    delta = _chan_delta(cols, base_cols, valid, x.dtype)   # (O, n)
    x2 = x.reshape(-1, x.shape[-1])
    x_sel = jnp.take(x2, ci, axis=1)                       # (T, n)
    corr = jax.lax.dot_general(x_sel, delta, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (T, O)
    return (y.reshape(-1, y.shape[-1]).astype(jnp.float32) + corr
            ).astype(y.dtype).reshape(y.shape)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def smt_channel_linear_dyn(impl: str, x, cols, ci, valid, frozen, base_cols):
    """Channel-sparse linear with traced column indices (scan path).

    cols/base_cols: (O, n) trainable / frozen column values; ci: (n,)
    int32 selected input channels; valid: (n,) bool; frozen: {"w": (O, I)}
    bf16 dense or {"wq" int8, "sw" fp32} q8 base — never updated."""
    return _chan_forward(x, cols, ci, valid, frozen, base_cols)


def _smt_channel_dyn_fwd(impl, x, cols, ci, valid, frozen, base_cols):
    y = _chan_forward(x, cols, ci, valid, frozen, base_cols)
    delta = _chan_delta(cols, base_cols, valid, x.dtype)
    return y, (x, ci, valid, frozen, delta, jnp.zeros((0,), cols.dtype))


def _smt_channel_dyn_bwd(impl: str, res, g):
    x, ci, valid, frozen, delta, dtype_probe = res
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    in_dim = x.shape[-1]

    grad_x = _base_matmul_T(g2, frozen)                      # (T, I)
    gd = jax.lax.dot_general(g2, delta, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (T, n)
    # scatter gd into columns ci as a one-hot matmul (MXU, not XLA scatter)
    onehot = (ci[:, None] == jnp.arange(in_dim)[None, :]).astype(gd.dtype)
    grad_x = (grad_x.astype(jnp.float32)
              + jax.lax.dot_general(gd, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
              ).astype(grad_x.dtype).reshape(x.shape)

    x_sel = jnp.take(x2, ci, axis=1)                         # (T, n)
    grad_cols = jax.lax.dot_general(g2, x_sel, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    grad_cols = grad_cols * valid.astype(grad_cols.dtype)[None, :]
    return (grad_x, grad_cols.astype(dtype_probe.dtype),
            _zero_cotangent(ci), _zero_cotangent(valid),
            jax.tree.map(_zero_cotangent, frozen),
            jnp.zeros_like(delta, dtype=dtype_probe.dtype))


smt_channel_linear_dyn.defvjp(_smt_channel_dyn_fwd, _smt_channel_dyn_bwd)


# ---------------------------------------------------------------------------
# Channel sparsity
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _smt_channel_linear(lp: LinearPlan, impl: str, x, cols, w):
    del lp, impl, cols
    return jnp.einsum("...i,oi->...o", x, w)


def _smt_channel_linear_fwd(lp, impl, x, cols, w):
    y = jnp.einsum("...i,oi->...o", x, w)
    return y, (x, w, jnp.zeros((0,), cols.dtype))


def _smt_channel_linear_bwd(lp: LinearPlan, impl: str, res, g):
    x, w, dtype_probe = res
    cols_dtype = dtype_probe.dtype
    grad_x = jnp.einsum("...o,oi->...i", g, w)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    idx = _channel_idx(lp)
    x_sel = jnp.take(x2, idx, axis=1)  # (T, n_ch)
    grad_cols = jax.lax.dot_general(
        g2, x_sel, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (out, n_ch)
    return grad_x, grad_cols.astype(cols_dtype), jnp.zeros_like(w)


@lru_cache(maxsize=None)
def _channel_idx_cached(channels: tuple):
    return np.array(channels, dtype=np.int32)


def _channel_idx(lp: LinearPlan):
    return jnp.asarray(_channel_idx_cached(lp.channels))


_smt_channel_linear.defvjp(_smt_channel_linear_fwd, _smt_channel_linear_bwd)


def smt_channel_linear(x, cols, w, lp: LinearPlan, impl: str = "oracle"):
    """y = x @ W.T with gradients routed to selected input-channel columns.

    cols: (out_dim, n_channels) trainable columns W[:, lp.channels]."""
    return _smt_channel_linear(lp, impl, x, cols, w)


# ---------------------------------------------------------------------------
# Model dispatch
# ---------------------------------------------------------------------------

def make_sparse_linear_dispatch(plan, trainable: Mapping[str, jax.Array],
                                impl: str = "auto", qweights=None):
    """Build the `linear(x, w, module, layer)` hook for models.llama.forward:
    planned linears compute through the sparse custom_vjp, everything else
    is a plain dense matmul.

    qweights (int8 frozen-base mode, matrix only): {"{layer}.{module}":
    {"wq", "sw"[, "base"]}} for every layer linear; planned linears use the
    block-corrected q8 path, unplanned frozen ones the plain q8 path."""
    def linear(x, w, module: str, layer_idx: int):
        ks = key_str(module, layer_idx)
        lp = plan.linears.get(ks)
        qw = qweights.get(ks) if qweights is not None else None
        if lp is None:
            if qw is not None:
                return frozen_q8_linear(x, qw["wq"], qw["sw"])
            return jnp.einsum("...i,oi->...o", x, w)
        if plan.mode == "matrix":
            if qw is not None:
                return smt_linear_q8(x, trainable[ks], qw["wq"], qw["sw"],
                                     qw["base"], lp, impl)
            return smt_linear(x, trainable[ks], w, lp, impl)
        return smt_channel_linear(x, trainable[ks], w, lp, impl)
    return linear
