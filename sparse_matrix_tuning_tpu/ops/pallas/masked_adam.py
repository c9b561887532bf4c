"""Fused block-masked Adam update as a Pallas TPU kernel.

The TPU-native equivalent of DeepSpeed's FusedAdam multi-tensor CUDA kernel
(reference imports at smt/smt.py:4, optimizer built at fine_tune.py:352):
one pass over the gathered (n_blocks, 256, 256) trainable tensor updating
p/m/v in place (input_output_aliases), with the scalar hyperparameters
prefetched into SMEM. XLA fuses the unfused update chain well already, so
this is a parity/bandwidth kernel: it guarantees exactly one HBM
read+write per state tensor per step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256


def _kernel(s_ref, p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref, vo_ref):
    lr, b1, b2, eps, wd, bc1, bc2 = (s_ref[i] for i in range(7))
    g = g_ref[...].astype(jnp.float32)
    p = p_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    update = (m / bc1) / (jnp.sqrt(v / bc2) + eps) + wd * p
    po_ref[...] = p - lr * update
    mo_ref[...] = m
    vo_ref[...] = v


def fused_block_adam_impl(p, g, m, v, scalars):
    """p/m/v: (n, 256, 256) fp32; g: (n, 256, 256);
    scalars: (7,) fp32 = [lr, beta1, beta2, eps, weight_decay,
    bias_corr1, bias_corr2]. Returns (p', m', v'). Traceable (call inside
    an outer jit); `fused_block_adam` is the standalone donated wrapper."""
    n = p.shape[0]
    spec = pl.BlockSpec((1, BLOCK, BLOCK), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct(p.shape, jnp.float32),
                   jax.ShapeDtypeStruct(p.shape, jnp.float32),
                   jax.ShapeDtypeStruct(p.shape, jnp.float32)),
        input_output_aliases={1: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, p, g, m, v)


fused_block_adam = jax.jit(fused_block_adam_impl, donate_argnums=(0, 2, 3))
