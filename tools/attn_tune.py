"""Sweep flash-attention block sizes vs XLA einsum on v5e shapes.
Run: python tools/attn_tune.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention,
)

from sparse_matrix_tuning_tpu.models.llama import _attention


def timeit(fn, *a, iters=5):
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    # force host sync through a scalar read
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    b, s, hq, hkv, hd = 8, 1024, 16, 8, 96
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, hq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    causal = jnp.tril(jnp.ones((s, s), bool))
    bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)[None, None]

    def loss_ein(q, k, v):
        return jnp.sum(_attention(q, k, v, bias).astype(jnp.float32) ** 2)

    ein_b = jax.jit(jax.grad(loss_ein, argnums=(0, 1, 2)))
    t_ein = timeit(ein_b, q, k, v)
    print(f"einsum fwd+bwd: {t_ein*1e3:.2f} ms")

    qt = q.transpose(0, 2, 1, 3)
    kt = jnp.repeat(k, hq // hkv, axis=2).transpose(0, 2, 1, 3)
    vt = jnp.repeat(v, hq // hkv, axis=2).transpose(0, 2, 1, 3)

    for bq, bk in [(256, 256), (512, 512), (512, 1024), (1024, 512), (128, 512)]:
        bs = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

        def loss_fla(q, k, v, bs=bs):
            o = flash_attention(q, k, v, causal=True,
                                sm_scale=1.0 / float(np.sqrt(hd)),
                                block_sizes=bs)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        try:
            fla_b = jax.jit(jax.grad(loss_fla, argnums=(0, 1, 2)))
            t = timeit(fla_b, qt, kt, vt)
            print(f"flash bq={bq} bk={bk}: {t*1e3:.2f} ms ({t_ein/t:.2f}x vs einsum)")
        except Exception as e:
            print(f"flash bq={bq} bk={bk}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
