"""Pallas TPU kernel: selected-block weight gradients.

Computes grad_blocks[i] = g[:, rb_i*256:+256]^T @ x[:, cb_i*256:+256]
for a static list of selected (row_block, col_block) pairs — the hot
backward op of SMT (reference semantics: deepspeed/smt/smt.py:382-404,
where each block grad is a per-block transpose-matmul summed over batch).

vs the XLA oracle (ops/sparse_linear.py:_block_grad_weight_xla), which
first materialises gathered (n, T, 256) row/col panels in HBM, this kernel
streams the panels HBM->VMEM tile by tile via the BlockSpec pipeline and
accumulates each 256x256 block on the MXU in fp32 — no gathered copies are
ever written back to HBM. Block indices arrive as scalar-prefetch operands
(PrefetchScalarGridSpec) so the DMA pipeline can compute source addresses
before the kernel body runs.

Grid: (n_blocks, T / T_TILE); the T dimension iterates innermost so the
fp32 accumulator block stays resident in VMEM across the reduction.
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


def _kernel(rb_ref, cb_ref, g_ref, x_ref, out_ref):
    del rb_ref, cb_ref  # consumed by the index_maps

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # (T_TILE, 256)^T @ (T_TILE, 256) -> (256, 256) on the MXU, fp32 accum
    out_ref[0] += jax.lax.dot_general(
        g_ref[...], x_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def _block_grad_weight_impl(g2, x2, row_blocks: tuple, col_blocks: tuple):
    rb = jnp.asarray(np.asarray(row_blocks, np.int32))
    cb = jnp.asarray(np.asarray(col_blocks, np.int32))
    return block_grad_weight_dyn(g2, x2, rb, cb)


def block_grad_weight_dyn(g2, x2, rb, cb) -> jax.Array:
    """Same kernel with TRACED (n,) int32 block indices — the scan-over-
    layers path feeds per-layer coordinate arrays. The indices were already
    scalar-prefetch operands, so nothing changes at the kernel level."""
    rb = rb.astype(jnp.int32)
    cb = cb.astype(jnp.int32)
    n = rb.shape[0]
    t = g2.shape[0]
    t_pad = -t % T_TILE
    if t_pad:
        g2 = jnp.pad(g2, ((0, t_pad), (0, 0)))
        x2 = jnp.pad(x2, ((0, t_pad), (0, 0)))
    num_t = g2.shape[0] // T_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, num_t),
        in_specs=[
            pl.BlockSpec((T_TILE, BLOCK),
                         lambda i, ti, rb_ref, cb_ref: (ti, rb_ref[i])),
            pl.BlockSpec((T_TILE, BLOCK),
                         lambda i, ti, rb_ref, cb_ref: (ti, cb_ref[i])),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, BLOCK),
                               lambda i, ti, rb_ref, cb_ref: (i, 0, 0)),
    )

    flops = 2 * n * g2.shape[0] * BLOCK * BLOCK
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, BLOCK, BLOCK), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * n * g2.shape[0] * BLOCK * g2.dtype.itemsize
                            + n * BLOCK * BLOCK * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rb, cb, g2, x2)


def block_grad_weight(g2: jax.Array, x2: jax.Array,
                      row_blocks, col_blocks) -> jax.Array:
    """g2: (T, out_dim), x2: (T, in_dim) -> (n, 256, 256) fp32.

    row_blocks/col_blocks: static int sequences of selected block coords."""
    return _block_grad_weight_impl(g2, x2,
                                   tuple(int(r) for r in row_blocks),
                                   tuple(int(c) for c in col_blocks))
