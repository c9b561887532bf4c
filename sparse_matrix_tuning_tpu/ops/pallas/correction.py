"""Pallas TPU kernel: fused block-correction epilogue.

Computes, in place over the base-matmul output,

    out[:, o_j*256:+256] += src[:, i_j*256:+256] @ D_j      j = 0..n-1

for (n,) block coordinates o/i (traced or static) and (n, 256, 256) delta
matrices — the exact-correction term of the q8 / scan sparse linears
(reference semantics: the selected-block contribution of the dense matmul,
deepspeed/smt/smt.py:366,:406; here it rides on top of an int8 or frozen
base, ops/sparse_linear.py module notes).

vs the XLA formulations this replaces:
  * _grouped_correction builds per-group concat panels (extra HBM copies)
    and chains one dot + slice-add per unique out block;
  * _dyn_correction (scan path) is a fully SEQUENTIAL chain of n
    dynamic-slice + dot + dynamic-update-slice steps whose cost scales
    linearly with the most-selected layer's padded block count (VERDICT r2
    weak #4).
This kernel pipelines everything: grid (T/T_TILE, n) with the out block
VMEM-resident across duplicate-o runs, src tiles streamed HBM->VMEM by the
BlockSpec pipeline, one 512x256x256 MXU dot per step, fp32 accumulation in
a VMEM scratch, and ONE read-modify-write of each touched out tile
(input_output_aliased; untouched out columns never move).

Requirements: coordinates SORTED by o (duplicate o entries must be
consecutive — sorted once at the call site; cheap, n is tens). Invalid /
padded entries carry delta == 0 (masked upstream) and simply add zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
T_TILE = 512


def _kernel(io_ref, id_ref, src_ref, delta_ref, out_alias_ref, out_ref,
            acc_ref):
    del id_ref  # consumed by src's index_map
    j = pl.program_id(1)
    n = pl.num_programs(1)

    # first step of a (ti, o) run: seed the fp32 accumulator from the
    # current out tile (the aliased input view — read once per run)
    first = jnp.logical_or(j == 0, io_ref[j] != io_ref[jnp.maximum(j - 1, 0)])

    @pl.when(first)
    def _():
        acc_ref[...] = out_alias_ref[...].astype(jnp.float32)

    acc_ref[...] += jax.lax.dot_general(
        src_ref[...], delta_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # write-back every step (VMEM copy); only the retiring content is
    # flushed to HBM, so duplicate-o runs cost no extra HBM traffic
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def block_correction_dyn(out2, src2, delta_mats, idx_out, idx_in):
    """out2: (T, O), src2: (T, I), delta_mats: (n, 256, 256) [D_j applied as
    src_panel @ D_j], idx_out/idx_in: (n,) int32 traced, idx_out SORTED
    ascending. Returns updated out2 (same dtype)."""
    n = delta_mats.shape[0]
    if n == 0:
        return out2
    idx_out = idx_out.astype(jnp.int32)
    idx_in = idx_in.astype(jnp.int32)
    t = out2.shape[0]
    t_pad = -t % T_TILE
    if t_pad:
        out2 = jnp.pad(out2, ((0, t_pad), (0, 0)))
        src2 = jnp.pad(src2, ((0, t_pad), (0, 0)))
    num_t = out2.shape[0] // T_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t, n),
        in_specs=[
            pl.BlockSpec((T_TILE, BLOCK),
                         lambda ti, j, io, ii: (ti, ii[j])),
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda ti, j, io, ii: (j, 0, 0)),
            pl.BlockSpec((T_TILE, BLOCK),
                         lambda ti, j, io, ii: (ti, io[j])),
        ],
        out_specs=pl.BlockSpec((T_TILE, BLOCK),
                               lambda ti, j, io, ii: (ti, io[j])),
        scratch_shapes=[pltpu.VMEM((T_TILE, BLOCK), jnp.float32)],
    )

    delta_mats = delta_mats.astype(src2.dtype)
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out2.shape, out2.dtype),
        input_output_aliases={4: 0},  # out2-as-input aliases the output
        cost_estimate=pl.CostEstimate(
            flops=2 * n * out2.shape[0] * BLOCK * BLOCK,
            bytes_accessed=(2 * n * out2.shape[0] * BLOCK
                            * src2.dtype.itemsize
                            + n * BLOCK * BLOCK * src2.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx_out, idx_in, src2, delta_mats, out2)
    return out[:t] if t_pad else out


def sort_by_out(idx_out, idx_in, delta_mats):
    """Sort the correction triplet by out-block id (kernel precondition).
    Traced-index variant; for static tuples sort in Python at plan time."""
    order = jnp.argsort(idx_out)
    return idx_out[order], idx_in[order], delta_mats[order]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _block_correction_static(out2, src2, delta_mats, idx_out: tuple,
                             idx_in: tuple):
    io = jnp.asarray(np.asarray(idx_out, np.int32))
    ii = jnp.asarray(np.asarray(idx_in, np.int32))
    return block_correction_dyn(out2, src2, delta_mats, io, ii)


def block_correction(out2, src2, delta_mats, idx_out, idx_in):
    """Static-coordinate wrapper (unrolled path): sorts by out block in
    Python, permutes delta accordingly, and calls the kernel."""
    order = sorted(range(len(idx_out)), key=lambda j: idx_out[j])
    io = tuple(int(idx_out[j]) for j in order)
    ii = tuple(int(idx_in[j]) for j in order)
    dm = delta_mats[jnp.asarray(order)] if list(order) != list(
        range(len(idx_out))) else delta_mats
    return _block_correction_static(out2, src2, dm, io, ii)
