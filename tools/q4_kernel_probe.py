"""Microbench the int4 fused unpack-matmul kernel vs the int8 XLA dot at
DECODE shapes (rows = batch*beams = 8/32), per matmul call.

Decode is weight-bandwidth-bound, so the scoreboard is effective GB/s of
frozen-weight traffic: q8 reads O*I bytes, q4 reads O*I/2 (+tiny scales).
If q4's ms/call is not clearly below q8's, the kernel is overhead-bound
and needs restructuring (bigger tiles / fewer grid steps), not more
bandwidth. v5e HBM ~819 GB/s.

Timing: ITERS data-chained calls inside one jit, closed with a host
transfer (CLAUDE.md: per-call timing over the axon tunnel is unreliable).
Chaining is through x (y reduced back to a row) so the weight read cannot
be hoisted.

Run: python tools/q4_kernel_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sparse_matrix_tuning_tpu.ops.quant import (
    q8_matmul_t, quantize_weight, quantize_weight_int4)
from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import q4_matmul_t_pallas

ITERS = 50


def timed_chain(matmul, x, *w, o):
    """Run matmul ITERS times, each consuming the previous output."""
    i = x.shape[-1]

    @jax.jit
    def chain(x, *w):
        def body(c, _):
            y = matmul(c, *w)                      # (rows, O)
            # fold y back into a (rows, I) carry so iterations are dependent
            c = c + jnp.sum(y, axis=-1, keepdims=True).astype(c.dtype) * 1e-6
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    _ = float(chain(x, *w))  # compile
    t0 = time.perf_counter()
    v = float(chain(x, *w))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    assert v == v, "NaN in chain"
    return dt


def probe(o, i, rows, key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (rows, i), jnp.bfloat16)
    w = (jax.random.normal(k2, (o, i), jnp.bfloat16) * 0.02)
    wq, sw = jax.jit(quantize_weight)(w)
    w4, s4 = quantize_weight_int4(w)
    w4, s4 = jax.device_put(w4), jax.device_put(s4)

    t8 = timed_chain(lambda c, wq, sw: q8_matmul_t(c, wq, sw), x, wq, sw, o=o)
    t4 = timed_chain(lambda c, w4, s4: q4_matmul_t_pallas(c, w4, s4),
                     x, w4, s4, o=o)
    bw8 = o * i / t8 / 1e6          # GB/s of weight bytes
    bw4 = o * i / 2 / t4 / 1e6
    print(f"({o:6d}x{i:6d}) rows={rows:3d}: "
          f"q8 {t8:7.3f} ms ({bw8:5.0f} GB/s) | "
          f"q4 {t4:7.3f} ms ({bw4:5.0f} GB/s) | q4/q8 {t4 / t8:.2f}x")


def main():
    key = jax.random.PRNGKey(0)
    for rows in (8, 32):
        probe(4096, 4096, rows, key)    # q/o proj
        probe(14336, 4096, rows, key)   # gate/up
        probe(4096, 14336, rows, key)   # down
    print("(weight GB/s near 819 = bandwidth-bound; far below = overhead)")


if __name__ == "__main__":
    main()
