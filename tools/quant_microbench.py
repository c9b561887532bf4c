"""W8A8 vs bf16 chained-matmul microbench on the real chip (host-sync
timed). Decides whether the int8 frozen-weight path is worth wiring in.
Run: python tools/quant_microbench.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    T, D, L = 8192, 4096, 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((T, D)) * 0.05, jnp.bfloat16)
    Wb = [jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
          for _ in range(L)]
    Wq = [jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8) for _ in range(L)]
    sw = [jnp.asarray(rng.random((D,)) * 0.001 + 1e-4, jnp.float32)
          for _ in range(L)]

    @jax.jit
    def chain_bf16(x, Ws):
        for W in Ws:
            x = jax.lax.dot_general(x, W, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = jax.nn.tanh(x).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def chain_w8a8(x, Wqs, sws):
        for W, s in zip(Wqs, sws):
            amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
            sx = jnp.maximum(amax, 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, W, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = jax.nn.tanh(y.astype(jnp.float32) * sx * s[None, :]).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    def timeit(fn, *a, iters=5):
        float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*a))
        return (time.perf_counter() - t0) / iters

    fl = 2 * T * D * D * L
    tb = timeit(chain_bf16, x0, Wb)
    tq = timeit(chain_w8a8, x0, Wq, sw)
    print(f"bf16 chain {tb*1e3:.2f}ms = {fl/tb/1e12:.0f} TF/s | "
          f"w8a8 chain {tq*1e3:.2f}ms = {fl/tq/1e12:.0f} TOP/s | "
          f"speedup {tb/tq:.2f}x")


if __name__ == "__main__":
    main()
