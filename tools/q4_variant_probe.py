"""Pinpoint the q4 decode kernel bottleneck by knocking out stages.

Chains matmuls across L DISTINCT weights (so weight DMAs pipeline like a
real decode step) and times variants of the kernel:

  full      — shipped kernel (unpack + dots + group scales)
  noscale   — dots, no per-group scale multiply        (scale VPU cost)
  nounpack  — single convert int8->bf16, no shifts     (shift VPU cost)
  dmaonly   — no dots at all, tile row-sum only        (DMA + step floor)
  q8        — XLA int8 dot_general baseline
  bf16      — XLA bf16 dot baseline (2x the bytes)

Numbers are ms per PASS over all L weights (one simulated decode layer
stack), with effective weight GB/s next to them.

Run: python tools/q4_variant_probe.py [rows]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_tuning_tpu.ops.quant import (
    q8_matmul_t, quantize_weight, quantize_weight_int4)

LANE, GROUPS = 128, 8
L = 8
O = I = 4096
ITERS = 30


def _kernel(x_lo_ref, x_hi_ref, w4_ref, sl_ref, sh_ref, out_ref, *, variant):
    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    p = w4_ref[...]
    x_lo, x_hi = x_lo_ref[...], x_hi_ref[...]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(GROUPS):
        pg = p[:, g * LANE:(g + 1) * LANE].astype(jnp.int32)
        if variant == "dmaonly":
            acc += jnp.sum(pg.astype(jnp.float32), axis=1)[None, :]
            continue
        if variant == "nounpack":
            wl = wh = p[:, g * LANE:(g + 1) * LANE].astype(jnp.bfloat16)
        else:
            wl = jnp.right_shift(jnp.left_shift(pg, 28), 28).astype(jnp.bfloat16)
            wh = jnp.right_shift(jnp.left_shift(pg, 24), 28).astype(jnp.bfloat16)
        al = jax.lax.dot_general(x_lo[:, g * LANE:(g + 1) * LANE], wl,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ah = jax.lax.dot_general(x_hi[:, g * LANE:(g + 1) * LANE], wh,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if variant == "noscale":
            acc += al + ah
        else:
            acc += al * sl_ref[g][None, :] + ah * sh_ref[g][None, :]
    out_ref[...] += acc


def q4_variant(x2, w4, sl_t, sh_t, variant, o_t=2048):
    t, _ = x2.shape
    o, k = w4.shape
    k_t = GROUPS * LANE
    x_lo, x_hi = x2[:, :k], x2[:, k:]
    out = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(1, o // o_t, k // k_t),
        in_specs=[
            pl.BlockSpec((t, k_t), lambda ti, oi, ki: (ti, ki)),
            pl.BlockSpec((t, k_t), lambda ti, oi, ki: (ti, ki)),
            pl.BlockSpec((o_t, k_t), lambda ti, oi, ki: (oi, ki)),
            pl.BlockSpec((GROUPS, o_t), lambda ti, oi, ki: (ki, oi)),
            pl.BlockSpec((GROUPS, o_t), lambda ti, oi, ki: (ki, oi)),
        ],
        out_specs=pl.BlockSpec((t, o_t), lambda ti, oi, ki: (ti, oi)),
        out_shape=jax.ShapeDtypeStruct((t, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_lo, x_hi, w4, sl_t, sh_t)
    return out


def bench(fn, x, weights, label, bytes_per_pass):
    @jax.jit
    def chain(x, weights):
        # UNROLLED over the L weights: a lax.scan over stacked weights
        # materialises a full per-layer copy at each slice, which swamps
        # the measurement (first version of this probe did exactly that).
        per_layer = [jax.tree.map(lambda a: a[l], weights) for l in range(L)]

        def it(c, _):
            for wl in per_layer:
                y = fn(c, wl)
                # reduction-free, bounded chaining
                c = jnp.clip(y[:, :I], -1.0, 1.0).astype(c.dtype)
            return c, ()
        c, _ = jax.lax.scan(it, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    _ = float(chain(x, weights))
    t0 = time.perf_counter()
    v = float(chain(x, weights))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {label:10s} {dt:7.3f} ms/pass   {bytes_per_pass / dt / 1e6:5.0f} GB/s weight")
    return dt


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (rows, I), jnp.bfloat16)
    ws, w4s, s4s = [], [], []
    for l in range(L):
        w = jax.random.normal(jax.random.PRNGKey(l + 1), (O, I),
                              jnp.bfloat16) * 0.02
        ws.append(w)
        wq, sw = jax.jit(quantize_weight)(w)
        w4, s4 = quantize_weight_int4(w)
        w4s.append((wq, sw, w4, s4))
    wq_s = jnp.stack([a[0] for a in w4s])
    sw_s = jnp.stack([a[1] for a in w4s])
    w4_s = jnp.stack([a[2] for a in w4s])
    kg = (I // 2) // LANE
    sl_s = jnp.stack([a[3][:, :kg].astype(jnp.float32).T for a in w4s])
    sh_s = jnp.stack([a[3][:, kg:].astype(jnp.float32).T for a in w4s])
    w_s = jnp.stack(ws)

    b4 = L * O * I // 2
    b8 = L * O * I
    print(f"L={L} chained ({O}x{I}) matmuls, rows={rows}:")
    bench(lambda c, w: jnp.einsum("ti,oi->to", c, w).astype(jnp.float32),
          x, w_s, "bf16", 2 * b8)
    bench(lambda c, w: q8_matmul_t(c, w[0], w[1]).astype(jnp.float32),
          x, (wq_s, sw_s), "q8", b8)
    for v in ("full", "noscale", "nounpack", "dmaonly"):
        bench(lambda c, w, v=v: q4_variant(c, w[0], w[1], w[2], v),
              x, (w4_s, sl_s, sh_s), v, b4)


if __name__ == "__main__":
    main()


def big_single():
    """One huge matmul (64 MB packed) — per-call overhead becomes noise, so
    this reads out the kernel's raw weight-DMA rate vs XLA's int8 dot."""
    O2, I2 = 16384, 8192
    rows = 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (rows, I2), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(9), (O2, I2), jnp.bfloat16) * 0.02
    wq, sw = jax.jit(quantize_weight)(w)
    w4, s4 = quantize_weight_int4(w)
    kg2 = (I2 // 2) // LANE
    sl = s4[:, :kg2].astype(jnp.float32).T
    sh = s4[:, kg2:].astype(jnp.float32).T

    def mk(fn):
        @jax.jit
        def chain(x, *w):
            def it(c, _):
                y = fn(c, *w)
                c = jnp.clip(y[:, :I2], -1.0, 1.0).astype(c.dtype)
                return c, ()
            c, _ = jax.lax.scan(it, x, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32))
        return chain

    print(f"single ({O2}x{I2}) matmul, rows={rows} (per-call floor amortised):")
    for label, chain, args, byt in [
        ("bf16", mk(lambda c, w: jnp.einsum("ti,oi->to", c, w)
                    .astype(jnp.float32)), (w,), 2 * O2 * I2),
        ("q8", mk(lambda c, a, b: q8_matmul_t(c, a, b).astype(jnp.float32)),
         (wq, sw), O2 * I2),
        ("q4-2048", mk(lambda c, a, b, d: q4_variant(c, a, b, d, "full", 2048)),
         (w4, sl, sh), O2 * I2 // 2),
        ("q4-512", mk(lambda c, a, b, d: q4_variant(c, a, b, d, "full", 512)),
         (w4, sl, sh), O2 * I2 // 2),
        ("q4-dma", mk(lambda c, a, b, d: q4_variant(c, a, b, d, "dmaonly", 2048)),
         (w4, sl, sh), O2 * I2 // 2),
    ]:
        _ = float(chain(x, *args))
        t0 = time.perf_counter()
        _ = float(chain(x, *args))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"  {label:10s} {dt:7.3f} ms   {byt / dt / 1e6:5.0f} GB/s weight")
