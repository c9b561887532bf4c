"""Try splash attention (v5-tuned Pallas MQA/MHA kernel) in-model vs einsum.
Run: python tools/splash_test.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk,
    splash_attention_mask as sm,
)

from sparse_matrix_tuning_tpu.models.llama import _attention


def splash_mha(q, k, v):
    """q: (B,S,Hq,hd); k/v: (B,S,Hkv,hd) -> (B,S,Hq*hd), causal.
    splash MQA layout: q (Hq,S,hd), kv (S,hd) per kv-group; use make_splash_mqa
    with grouped heads via vmap over batch."""
    b, s, hq, hd = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(hq)])
    kernel = sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)
    scale = 1.0 / float(np.sqrt(hd))

    def one_batch(qb, kb, vb):
        # qb (S,Hq,hd) -> (Hq,S,hd); kv repeated to Hq
        qh = (qb * scale).transpose(1, 0, 2)
        kh = jnp.repeat(kb, groups, axis=1).transpose(1, 0, 2)
        vh = jnp.repeat(vb, groups, axis=1).transpose(1, 0, 2)
        out = kernel(qh, kh, vh)  # (Hq,S,hd)
        return out.transpose(1, 0, 2)

    out = jax.vmap(one_batch)(q, k, v)
    return out.reshape(b, s, hq * hd)


def main():
    b, s, hq, hkv, hd = 8, 1024, 16, 8, 96
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, hq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    causal = jnp.tril(jnp.ones((s, s), bool))
    bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)[None, None]

    # numerics
    a = _attention(q, k, v, bias)
    bsp = splash_mha(q, k, v)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bsp.astype(jnp.float32))))
    print("max abs diff vs einsum:", diff)

    def timeit(fn, *args, iters=8):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters

    # 16-layer chain to amortize sync overhead (mimic model scale)
    @jax.jit
    def chain_ein(q, k, v):
        x = q
        for _ in range(16):
            x = _attention(x, k, v, bias)
        return x

    @jax.jit
    def chain_splash(q, k, v):
        x = q
        for _ in range(16):
            x = splash_mha(x, k, v).reshape(b, s, hq, hd)
        return x

    te = timeit(chain_ein, q, k, v)
    ts = timeit(chain_splash, q, k, v)
    print(f"fwd 16x: einsum {te*1e3:.1f}ms splash {ts*1e3:.1f}ms ({te/ts:.2f}x)")

    @jax.jit
    def g_ein(q, k, v):
        return jax.grad(lambda q: jnp.sum(chain_ein(q, k, v).astype(jnp.float32) ** 2))(q)

    @jax.jit
    def g_splash(q, k, v):
        return jax.grad(lambda q: jnp.sum(chain_splash(q, k, v).astype(jnp.float32) ** 2))(q)

    te = timeit(g_ein, q, k, v, iters=4)
    ts = timeit(g_splash, q, k, v, iters=4)
    print(f"fwd+bwd 16x: einsum {te*1e3:.1f}ms splash {ts*1e3:.1f}ms ({te/ts:.2f}x)")


if __name__ == "__main__":
    main()
