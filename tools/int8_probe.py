"""Int8 frozen-weight matmul feasibility probe on the real chip.

Answers, for the sparse-phase forward/grad-input economics (VERDICT r1
next-step #2b): what does int8 actually buy on this v5e via XLA, separating
  (1) the MXU upper bound (pre-quantized int8 x int8 dot),
  (2) dynamic per-row activation quant + int8 dot + dequant (realistic),
  (3) quant shared across 2 consumers (gate/up style),
  (4) int8 only on the weight side (w8a16-style bf16 upcast — bandwidth-only).
All timings use a host transfer (float()) because block_until_ready returns
early over the axon tunnel. Run: python tools/int8_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, iters=10):
    float(fn(*a))  # compile + first run
    float(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    out = float(r)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt


def row_quant(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def probe(T, O, I, tag):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, I)) * 0.05, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((O, I)) * 0.02, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (O, I)), jnp.int8)
    sw = jnp.asarray(rng.random((O,)) * 1e-3 + 1e-4, jnp.float32)
    xq0, sx0 = jax.jit(row_quant)(x)
    xq0 = jax.block_until_ready(xq0)

    fl = 2.0 * T * O * I

    @jax.jit
    def f_bf16(x, w):
        y = jnp.einsum("ti,oi->to", x, w)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def f_int8_pre(xq, sx, wq, sw):
        y = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32) * sx * sw[None, :])

    @jax.jit
    def f_int8_dyn(x, wq, sw):
        xq, sx = row_quant(x)
        y = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32) * sx * sw[None, :])

    @jax.jit
    def f_int8_dyn_shared2(x, wq, sw):
        # one quant feeding two matmuls (gate/up; also q/k/v pattern)
        xq, sx = row_quant(x)
        acc = jnp.zeros((), jnp.float32)
        for _ in range(2):
            y = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = acc + jnp.sum(y.astype(jnp.float32) * sx * sw[None, :])
        return acc

    @jax.jit
    def f_bf16_x2(x, w):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(2):
            acc = acc + jnp.sum(jnp.einsum("ti,oi->to", x, w).astype(jnp.float32))
        return acc

    @jax.jit
    def f_w8a16(x, wq, sw):
        wb = (wq.astype(jnp.bfloat16) * sw[:, None].astype(jnp.bfloat16))
        y = jnp.einsum("ti,oi->to", x, wb)
        return jnp.sum(y.astype(jnp.float32))

    tb = timeit(f_bf16, x, w)
    tpre = timeit(f_int8_pre, xq0, sx0, wq, sw)
    tdyn = timeit(f_int8_dyn, x, wq, sw)
    tsh2 = timeit(f_int8_dyn_shared2, x, wq, sw)
    tb2 = timeit(f_bf16_x2, x, w)
    tw8 = timeit(f_w8a16, x, wq, sw)

    print(f"[{tag}] T={T} O={O} I={I}  bf16 {tb*1e3:7.3f}ms {fl/tb/1e12:6.1f}TF")
    print(f"    int8 prequant   {tpre*1e3:7.3f}ms {fl/tpre/1e12:6.1f}TOP  "
          f"speedup {tb/tpre:5.2f}x   <- MXU upper bound")
    print(f"    int8 dynquant   {tdyn*1e3:7.3f}ms {fl/tdyn/1e12:6.1f}TOP  "
          f"speedup {tb/tdyn:5.2f}x")
    print(f"    int8 dyn shared2 {tsh2*1e3:6.3f}ms  speedup vs 2xbf16 {tb2/tsh2:5.2f}x")
    print(f"    w8a16 upcast    {tw8*1e3:7.3f}ms  speedup {tb/tw8:5.2f}x")


def main():
    print("devices:", jax.devices())
    T = 8192
    probe(T, 1536, 1536, "bench qkv/o h=1536")
    probe(T, 4096, 1536, "bench gate/up")
    probe(T, 1536, 4096, "bench down")
    probe(T, 4096, 4096, "8B qkv/o h=4096")
    probe(T, 14336, 4096, "8B gate/up")


if __name__ == "__main__":
    main()
