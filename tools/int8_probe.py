"""Int8 frozen-weight matmul feasibility probe on the real chip.

Answers, for the sparse-phase forward/grad-input economics (VERDICT r1
next-step #2b): what does int8 actually buy on this v5e via XLA.

Methodology: the axon tunnel adds ~3.5ms of dispatch latency per host sync
and XLA dead-code-eliminates unconsumed matmuls, so each measurement is a
DATA-DEPENDENT chain of 2L matmuls (x -> W1 -> y -> W2 -> x, the MLP
pattern) inside one jit with a single host transfer. Variants:
  bf16      : plain bf16 chain (baseline)
  int8-dyn  : per-row dynamic quant (amax+round+clip) before every matmul,
              int8 x int8 -> int32 MXU dot, fp32 rescale epilogue
  int8-cast : saturating cast only (no amax pass) — isolates the quant-pass
              cost from the MXU int8 gain (upper bound for fused quant)
Run: python tools/int8_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

L = 8  # W1/W2 pairs per chain -> 2L matmuls


def timeit(fn, *a, iters=8):
    float(fn(*a))
    float(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    out = float(r)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out), out
    return dt


def row_quant(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def probe(T, O, I, tag):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((T, I)) * 0.05, jnp.bfloat16)
    w1 = [jnp.asarray(rng.standard_normal((O, I)) * 0.02, jnp.bfloat16)
          for _ in range(L)]
    w2 = [jnp.asarray(rng.standard_normal((I, O)) * 0.02, jnp.bfloat16)
          for _ in range(L)]
    w1q = [jnp.asarray(rng.integers(-127, 128, (O, I)), jnp.int8) for _ in range(L)]
    w2q = [jnp.asarray(rng.integers(-127, 128, (I, O)), jnp.int8) for _ in range(L)]
    s1 = jnp.float32(0.02 / 127.0)
    s2 = jnp.float32(0.02 / 127.0)

    fl = 2.0 * T * O * I * 2 * L

    def mmT(a, b, ptype):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=ptype)

    @jax.jit
    def f_bf16(x, w1, w2):
        for a, b in zip(w1, w2):
            y = mmT(x, a, jnp.float32).astype(jnp.bfloat16)
            x = mmT(y, b, jnp.float32).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def f_int8_dyn(x, w1q, w2q):
        for a, b in zip(w1q, w2q):
            xq, sx = row_quant(x)
            y = mmT(xq, a, jnp.int32)
            y = (y.astype(jnp.float32) * sx * s1).astype(jnp.bfloat16)
            yq, sy = row_quant(y)
            z = mmT(yq, b, jnp.int32)
            x = (z.astype(jnp.float32) * sy * s2).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def f_int8_cast(x, w1q, w2q):
        # saturating cast stands in for "quant fused into the producer"
        for a, b in zip(w1q, w2q):
            xq = jnp.clip(x.astype(jnp.float32) * 64.0, -127, 127).astype(jnp.int8)
            y = mmT(xq, a, jnp.int32)
            y = (y.astype(jnp.float32) * s1).astype(jnp.bfloat16)
            yq = jnp.clip(y.astype(jnp.float32) * 64.0, -127, 127).astype(jnp.int8)
            z = mmT(yq, b, jnp.int32)
            x = (z.astype(jnp.float32) * s2).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    tb = timeit(f_bf16, x0, w1, w2)
    tdyn = timeit(f_int8_dyn, x0, w1q, w2q)
    tcast = timeit(f_int8_cast, x0, w1q, w2q)

    print(f"[{tag}] T={T} O={O} I={I} ({2*L} chained matmuls)")
    print(f"    bf16       {tb*1e3:8.2f}ms {fl/tb/1e12:6.1f}TF")
    print(f"    int8-dyn   {tdyn*1e3:8.2f}ms {fl/tdyn/1e12:6.1f}TOP speedup {tb/tdyn:5.2f}x")
    print(f"    int8-cast  {tcast*1e3:8.2f}ms {fl/tcast/1e12:6.1f}TOP speedup {tb/tcast:5.2f}x")


def main():
    print("devices:", jax.devices())
    T = 8192
    probe(T, 1536, 1536, "bench qkv/o h=1536")
    probe(T, 4096, 1536, "bench mlp 4096x1536")
    probe(T, 4096, 4096, "8B qkv/o h=4096")
    probe(T, 14336, 4096, "8B mlp 14336x4096")


if __name__ == "__main__":
    main()
