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
                                impl: str = "auto"):
    """Build the `linear(x, w, module, layer)` hook for models.llama.forward:
    planned linears compute through the sparse custom_vjp, everything else
    is a plain dense matmul."""
    def linear(x, w, module: str, layer_idx: int):
        ks = key_str(module, layer_idx)
        lp = plan.linears.get(ks)
        if lp is None:
            return jnp.einsum("...i,oi->...o", x, w)
        if plan.mode == "matrix":
            return smt_linear(x, trainable[ks], w, lp, impl)
        return smt_channel_linear(x, trainable[ks], w, lp, impl)
    return linear
