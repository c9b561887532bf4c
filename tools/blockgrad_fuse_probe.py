"""Is fusing grad_x into the Pallas block-grad kernel worth building?

VERDICT r2 next-step #4b suggested fusing grad_x (the dense g @ W input
gradient) into ops/pallas/block_grad.py so g is read from HBM once instead
of twice. Before hand-writing that kernel, measure the ceiling of the win
on the bench geometry (v5e): the two ops reduce over DIFFERENT dims
(grad_x over out_dim, block-grad over T), so a fused kernel must hand-
schedule the dense matmul itself — and tools/q8_epilogue_probe.py already
showed a hand-written Pallas dense matmul runs 20-25% slower than XLA's
dot_general on this chip. The fusion pays only if

    saved = (one extra HBM read of g)  >  20% of the dense matmul time

Per-linear timing (T=8192 tokens = bs8 x seq1024, bench widths):
  a) grad_x alone        : q8_matmul(g, Wq, sw)   [or bf16 einsum]
  b) block_grad alone    : Pallas block_grad_weight (n blocks)
  c) both (today's bwd)  : a + b in one jit
  d) g-read bound        : n_blocks * T * 256 * 2 bytes / 819 GB/s

If (c) - (a) ~= (b) and (d) << 20% of (a), the fusion cannot win.
All timings data-chained and closed with a host transfer (CLAUDE.md:
per-call timing over the axon tunnel is unreliable).

Run: python tools/blockgrad_fuse_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.ops.pallas.block_grad import block_grad_weight_dyn
from sparse_matrix_tuning_tpu.ops.quant import q8_matmul, quantize_weight

T = 8192  # bs 8 x seq 1024 (bench geometry)
BLOCK = 256
ITERS = 20


def timed(fn, g, x, wq, sw, rb, cb, label=""):
    """ITERS data-chained invocations inside ONE jit, closed with a host
    transfer (CLAUDE.md: per-call timing over the tunnel is unreliable;
    unchained calls get coalesced/DCE'd and report garbage)."""
    @jax.jit
    def chain(g, x, wq, sw, rb, cb):
        def it(gc, _):
            out = fn(gc, x, wq, sw, rb, cb)
            y = out[0] if isinstance(out, tuple) else out
            # fold a scalar of the result back into g (bounded, chained)
            delta = jnp.tanh(jnp.sum(y.astype(jnp.float32)) * 1e-12)
            if isinstance(out, tuple):  # also consume the second output
                delta = delta + jnp.tanh(
                    jnp.sum(out[1].astype(jnp.float32)) * 1e-12)
            return gc + (delta * 1e-6).astype(gc.dtype), ()
        gc, _ = jax.lax.scan(it, g, None, length=ITERS)
        return jnp.sum(gc.astype(jnp.float32))

    _ = float(chain(g, x, wq, sw, rb, cb))  # compile + warm
    t0 = time.perf_counter()
    v = float(chain(g, x, wq, sw, rb, cb))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {label:34s} {dt:7.3f} ms")
    return dt


def probe(o, i, n_blocks, key):
    print(f"linear ({o}x{i}), {n_blocks} selected blocks, T={T}:")
    k1, k2, k3 = jax.random.split(key, 3)
    g = jax.random.normal(k1, (T, o), jnp.bfloat16)
    x = jax.random.normal(k2, (T, i), jnp.bfloat16)
    w = jax.random.normal(k3, (o, i), jnp.bfloat16) * 0.02
    wq, sw = jax.jit(quantize_weight)(w)
    rng = np.random.default_rng(0)
    rb = jnp.asarray(rng.integers(0, o // BLOCK, n_blocks), jnp.int32)
    cb = jnp.asarray(rng.integers(0, i // BLOCK, n_blocks), jnp.int32)

    # iteration chained through g so XLA cannot hoist/DCE work
    @jax.jit
    def grad_x_only(g, x, wq, sw, rb, cb):
        return q8_matmul(g, wq, sw)

    @jax.jit
    def blocks_only(g, x, wq, sw, rb, cb):
        return block_grad_weight_dyn(g, x, rb, cb)

    @jax.jit
    def both(g, x, wq, sw, rb, cb):
        return q8_matmul(g, wq, sw), block_grad_weight_dyn(g, x, rb, cb)

    a = timed(grad_x_only, g, x, wq, sw, rb, cb, label="grad_x (q8 dense)")
    b = timed(blocks_only, g, x, wq, sw, rb, cb, label="block_grad (pallas)")
    c = timed(both, g, x, wq, sw, rb, cb, label="both (today's bwd)")
    g_read_ms = n_blocks * T * BLOCK * 2 / 819e9 * 1e3
    print(f"  overlap today: a+b-c = {a + b - c:.3f} ms; "
          f"fusion ceiling (one g re-read) = {g_read_ms:.3f} ms; "
          f"pallas-matmul risk (20% of grad_x) = {0.2 * a:.3f} ms")
    return a, b, c, g_read_ms


def main():
    key = jax.random.PRNGKey(0)
    # bench geometry: per-layer selected counts from the synthetic plan
    # (q_proj 2, gate 4, down 4 blocks at 0.84% overall sparsity)
    probe(4096, 4096, 2, key)
    probe(14336, 4096, 4, key)
    probe(4096, 14336, 4, key)
    # denser selection (paper sweeps to 3%+): does block_grad start to bite?
    probe(14336, 4096, 16, key)


if __name__ == "__main__":
    main()
