"""Sweep fullk-attention kernel variants on the v5e with tunnel-proof
timing (N data-dependent calls chained in one jit; per-call time = total/N,
CLAUDE.md timing rule). Run: python tools/attn_fullk_sweep.py [fwd|bwd]
"""
import sys
import time
import functools

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bench import enable_compilation_cache

enable_compilation_cache()

NEG_INF = float(jnp.finfo(jnp.float32).min)
B, S, HQ, HKV, HD = 8, 1024, 32, 8, 128
G = HQ // HKV
N = 16


def softmax_unnorm(sc, qi, bq, s_real):
    qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    sc = jnp.where((qpos >= kpos) & (kpos < s_real), sc, NEG_INF)
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, bq):
    qi = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sc = sc * (1.0 / np.sqrt(HD))
    e, denom = softmax_unnorm(sc, qi, bq, S)
    o = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o * (1.0 / denom)).astype(o_ref.dtype)


def build_fwd(bq):
    nq = S // bq

    def one(q4, k3, v3):
        return pl.pallas_call(
            functools.partial(fwd_kernel, bq=bq),
            grid=(B * HKV, G, nq),
            in_specs=[
                pl.BlockSpec((1, bq, HD), lambda i, gi, qi: (i, gi * nq + qi, 0)),
                pl.BlockSpec((1, S, HD), lambda i, gi, qi: (i, 0, 0)),
                pl.BlockSpec((1, S, HD), lambda i, gi, qi: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, HD),
                                   lambda i, gi, qi: (i, gi * nq + qi, 0)),
            out_shape=jax.ShapeDtypeStruct(q4.shape, q4.dtype),
        )(q4, k3, v3)
    return one


def fwd_kernel_skip(q_ref, k_ref, v_ref, o_ref, acc, *, bq, nk_chunks):
    """Causal chunk skip: q-tile qi only multiplies k chunks <= qi."""
    qi = pl.program_id(2)
    q = q_ref[0]

    def chunk(ci, carry):
        m_prev, d_prev, _ = carry
        k = k_ref[0, pl.ds(ci * bq, bq), :]
        v = v_ref[0, pl.ds(ci * bq, bq), :]
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = sc * (1.0 / np.sqrt(HD))
        qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
        kpos = ci * bq + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        sc = jnp.where(qpos >= kpos, sc, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
        scale = jnp.exp(m_prev - m_cur)
        e = jnp.exp(sc - m_cur)
        d_cur = d_prev * scale + jnp.sum(e, axis=-1, keepdims=True)
        acc[...] = acc[...] * scale + jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_cur, d_cur, 0

    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    init = (jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32), 0)
    m, d, _ = jax.lax.fori_loop(0, qi + 1, chunk, init)
    o_ref[0] = (acc[...] * (1.0 / d)).astype(o_ref.dtype)


def build_fwd_skip(bq):
    nq = S // bq
    from jax.experimental.pallas import tpu as pltpu

    def one(q4, k3, v3):
        return pl.pallas_call(
            functools.partial(fwd_kernel_skip, bq=bq, nk_chunks=nq),
            grid=(B * HKV, G, nq),
            in_specs=[
                pl.BlockSpec((1, bq, HD), lambda i, gi, qi: (i, gi * nq + qi, 0)),
                pl.BlockSpec((1, S, HD), lambda i, gi, qi: (i, 0, 0)),
                pl.BlockSpec((1, S, HD), lambda i, gi, qi: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, HD),
                                   lambda i, gi, qi: (i, gi * nq + qi, 0)),
            out_shape=jax.ShapeDtypeStruct(q4.shape, q4.dtype),
            scratch_shapes=[pltpu.VMEM((bq, HD), jnp.float32)],
        )(q4, k3, v3)
    return one


def bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, bq):
    gi = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(jnp.logical_and(gi == 0, qi == 0))
    def _():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sc = sc * (1.0 / np.sqrt(HD))
    e, denom = softmax_unnorm(sc, qi, bq, S)
    p = e * (1.0 / denom)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * (1.0 / np.sqrt(HD))).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(p.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def build_bwd(bq):
    nq = S // bq
    q_spec = pl.BlockSpec((1, bq, HD), lambda i, gi, qi: (i, gi * nq + qi, 0))
    kv_spec = pl.BlockSpec((1, S, HD), lambda i, gi, qi: (i, 0, 0))

    def one(q4, k3, v3, do4):
        return pl.pallas_call(
            functools.partial(bwd_kernel, bq=bq),
            grid=(B * HKV, G, nq),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            out_shape=[
                jax.ShapeDtypeStruct(q4.shape, q4.dtype),
                jax.ShapeDtypeStruct(k3.shape, jnp.float32),
                jax.ShapeDtypeStruct(v3.shape, jnp.float32),
            ],
        )(q4, k3, v3, do4)
    return one


def chain_bwd(one, k3, v3, do4):
    def f(q4):
        def body(c, _):
            dq, dk, dv = one(c, k3, v3, do4)
            # make all three outputs data-live
            return (dq + dk.astype(dq.dtype).mean() +
                    dv.astype(dq.dtype).mean()), None
        out, _ = jax.lax.scan(body, q4, None, length=N)
        return out
    return jax.jit(f)


def chain(one, k3, v3):
    def f(q4):
        def body(c, _):
            return one(c, k3, v3), None
        out, _ = jax.lax.scan(body, q4, None, length=N)
        return out
    return jax.jit(f)


def timeit(jf, *args):
    o = jf(*args)
    float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(3):
        o = jf(*args)
        float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / 3 / N


def main():
    rng = np.random.default_rng(0)
    q4 = jnp.asarray(rng.standard_normal((B * HKV, G * S, HD)), jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((B * HKV, S, HD)), jnp.bfloat16)
    v3 = jnp.asarray(rng.standard_normal((B * HKV, S, HD)), jnp.bfloat16)

    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    if which == "fwd":
        for bq in (256, 512, 1024):
            t = timeit(chain(build_fwd(bq), k3, v3), q4)
            print(f"fwd full bq={bq}: {t*1e3:.3f} ms", flush=True)
        for bq in (256, 512):
            try:
                t = timeit(chain(build_fwd_skip(bq), k3, v3), q4)
                print(f"fwd skip bq={bq}: {t*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"fwd skip bq={bq}: FAILED {str(e)[:100]}", flush=True)
    elif which == "bwd":
        do4 = jnp.asarray(rng.standard_normal(q4.shape), jnp.bfloat16)
        for bq in (256, 512):
            try:
                t = timeit(chain_bwd(build_bwd(bq), k3, v3, do4), q4)
                print(f"bwd fused bq={bq}: {t*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"bwd fused bq={bq}: FAILED {str(e)[:120]}", flush=True)
    elif which == "ref":
        # einsum + flash fwd+bwd chained baselines
        from sparse_matrix_tuning_tpu.models.llama import (_attention,
                                                           _flash_attention)
        causal = np.tril(np.ones((S, S), bool))
        bias = jnp.asarray(
            np.where(causal, 0.0, float(np.finfo(np.float32).min))[None, None])
        qb = jnp.asarray(rng.standard_normal((B, S, HQ, HD)), jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal((B, S, HKV, HD)), jnp.bfloat16)
        vb = jnp.asarray(rng.standard_normal((B, S, HKV, HD)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((B, S, HQ * HD)), jnp.bfloat16)

        def make(f):
            def loss(q, k, v):
                return jnp.sum(f(q, k, v).astype(jnp.float32)
                               * w.astype(jnp.float32))
            gradf = jax.grad(loss, argnums=(0, 1, 2))

            def chained(q):
                def body(c, _):
                    dq, dk, dv = gradf(c, kb, vb)
                    return (dq + dk.mean() + dv.mean()).astype(c.dtype), None
                out, _ = jax.lax.scan(body, q, None, length=N)
                return out
            return jax.jit(chained)

        for name, f in [("einsum", lambda q, k, v: _attention(q, k, v, bias)),
                        ("flash", _flash_attention)]:
            t = timeit(make(f), qb)
            print(f"{name} fwd+bwd: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
