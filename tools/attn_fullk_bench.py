"""fullk Pallas attention vs XLA einsum vs stock flash on the v5e, at the
wide-bench geometry and nearby shapes. Run: python tools/attn_fullk_bench.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import enable_compilation_cache
from sparse_matrix_tuning_tpu.models.llama import (
    _attention, _flash_attention, _fullk_attention)

enable_compilation_cache()


def timeit(fn, *a, iters=8):
    out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def run(b, s, hq, hkv, hd, only=None):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, hq, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), jnp.bfloat16)
    causal = np.tril(np.ones((s, s), bool))
    bias = jnp.asarray(
        np.where(causal, 0.0, float(np.finfo(np.float32).min))[None, None])
    w = jnp.asarray(rng.standard_normal((b, s, hq * hd)), jnp.bfloat16)

    impls = {
        "einsum": lambda q, k, v: _attention(q, k, v, bias),
        "fullk": lambda q, k, v: _fullk_attention(q, k, v),
        "flash": lambda q, k, v: _flash_attention(q, k, v),
    }
    if only:
        impls = {n: f for n, f in impls.items() if n in only}
    print(f"\n== b={b} s={s} hq={hq} hkv={hkv} hd={hd} ==", flush=True)
    results = {}
    for name, f in impls.items():
        def loss(q, k, v, f=f):
            return jnp.sum((f(q, k, v).astype(jnp.float32)
                            * w.astype(jnp.float32)))
        try:
            tf = timeit(jax.jit(f), q, k, v)
            tb = timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), q, k, v)
            results[name] = (tf, tb)
            print(f"{name:7s} fwd {tf*1e3:7.2f}ms  fwd+bwd {tb*1e3:7.2f}ms",
                  flush=True)
        except Exception as e:
            print(f"{name:7s} FAILED: {str(e)[:120]}", flush=True)
    if "einsum" in results and "fullk" in results:
        ef, eb = results["einsum"]
        ff, fb = results["fullk"]
        print(f"fullk vs einsum: fwd {ef/ff:.2f}x  fwd+bwd {eb/fb:.2f}x")


SHAPES = {
    "wide": (8, 1024, 32, 8, 128),   # wide-bench geometry (Llama-3-8B widths)
    "s2048": (4, 2048, 32, 8, 128),
    "h1536": (8, 1024, 16, 8, 96),   # 550M bench model heads
    "s4096": (2, 4096, 32, 8, 128),
}


def main():
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    names = args or list(SHAPES)
    for n in names:
        run(*SHAPES[n], only=only)


if __name__ == "__main__":
    main()
