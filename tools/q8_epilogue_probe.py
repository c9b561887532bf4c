"""Does the q8 scaling epilogue cost HBM bandwidth, or does XLA fuse it?

q8_matmul_t computes y_i32 = xq @ Wq.T (int32) then (y * sx * sw) -> bf16.
If XLA does NOT fuse the epilogue into the dot, the (T, O) int32 product
round-trips HBM (write 4B/elt + read 4B/elt) before the 2B/elt bf16 write —
~0.9 ms extra per (8192, 14336) matmul at v5e bandwidth. This probe times,
at bench shapes, a data-dependently chained stack of:

  a) raw int8 dot_general (int32 out, no scaling)     — floor
  b) q8_matmul_t (current: dot + fp32 scale -> bf16)  — current path
  c) bf16 einsum                                      — reference
  d) q8 Pallas fused kernel (if ops/pallas/q8_matmul.py exists)

Chaining rule (CLAUDE.md): consume each output in the next op inside ONE
jit; time with a host transfer. Run: python tools/q8_epilogue_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import enable_compilation_cache

enable_compilation_cache()

from sparse_matrix_tuning_tpu.ops.quant import q8_matmul_t, quantize_weight, row_quant

T = 8192
SHAPES = [(4096, 4096), (14336, 4096), (4096, 14336)]
ITERS = 8


def timeit(fn, *a):
    out = fn(*a)
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*a)
    float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    key = jax.random.PRNGKey(0)
    for O, I in SHAPES:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (T, I), jnp.bfloat16)
        w = jax.random.normal(k2, (O, I), jnp.bfloat16) * 0.02
        wq, sw = quantize_weight(w)
        # a chained stack needs square-ish reuse: project back with a second
        # weight of transposed shape so the output feeds the next iteration
        wb = jax.random.normal(key, (I, O), jnp.bfloat16) * 0.02
        wbq, swb = quantize_weight(wb)

        DEPTH = 6

        @jax.jit
        def chain_raw(x, wq, wbq):
            h = x
            for _ in range(DEPTH):
                hq, _ = row_quant(h)
                y = jax.lax.dot_general(hq, wq, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                # cheapest possible consumption: shift back to bf16 without
                # the fp32 scale muls (NOT numerically meaningful)
                y16 = (y >> 8).astype(jnp.bfloat16)
                yq, _ = row_quant(y16)
                h2 = jax.lax.dot_general(yq, wbq, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                h = (h2 >> 8).astype(jnp.bfloat16)
            return h.astype(jnp.float32)

        @jax.jit
        def chain_q8(x, wq, sw, wbq, swb):
            h = x
            for _ in range(DEPTH):
                y = q8_matmul_t(h, wq, sw)
                h = q8_matmul_t(y, wbq, swb)
            return h.astype(jnp.float32)

        @jax.jit
        def chain_bf16(x, w, wb):
            h = x
            for _ in range(DEPTH):
                y = jnp.einsum("ti,oi->to", h, w)
                h = jnp.einsum("to,io->ti", y, wb)
            return h.astype(jnp.float32)

        t_raw = timeit(chain_raw, x, wq, wbq)
        t_q8 = timeit(chain_q8, x, wq, sw, wbq, swb)
        t_bf = timeit(chain_bf16, x, w, wb)
        per = 1e3 / (2 * DEPTH)  # ms per single matmul
        print(f"(T={T}, O={O}, I={I}) per-matmul: "
              f"raw-int8 {t_raw*per:6.3f}ms | q8(current) {t_q8*per:6.3f}ms "
              f"| bf16 {t_bf*per:6.3f}ms | epilogue +{(t_q8-t_raw)*per:6.3f}ms")
        try:
            from sparse_matrix_tuning_tpu.ops.pallas.q8_matmul import (
                q8_matmul_t_fused)

            @jax.jit
            def chain_fused(x, wq, sw, wbq, swb):
                h = x
                for _ in range(DEPTH):
                    y = q8_matmul_t_fused(h, wq, sw)
                    h = q8_matmul_t_fused(y, wbq, swb)
                return h.astype(jnp.float32)

            t_f = timeit(chain_fused, x, wq, sw, wbq, swb)
            print(f"                 fused-pallas {t_f*per:6.3f}ms")
        except ImportError:
            pass


if __name__ == "__main__":
    main()
