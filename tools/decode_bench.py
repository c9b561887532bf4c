"""Generation throughput + compile-time accounting on the real chip
(KV-cache greedy + beam-4, per-layer loop vs scan-over-layers decode).

The eval harness compiles one decode program per (prompt bucket, beams)
pair, reused across all 8 datasets; this reports both the steady-state
throughput and the total compile cost at realistic bucket coverage
(VERDICT r1 weak #5 done-criterion).
Run: python tools/decode_bench.py [--scan/--loop]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_cfg
from sparse_matrix_tuning_tpu.eval.generate import (
    GenerationConfig, generate, prepare_decode_params,
)
from sparse_matrix_tuning_tpu.models.llama import init_params


def main():
    model_cfg, _, _ = bench_cfg(small=False)
    params = init_params(jax.random.PRNGKey(0), model_cfg, dtype=jnp.bfloat16)
    use_scan = "--loop" not in sys.argv
    if use_scan:
        params = prepare_decode_params(params, model_cfg)
    print(f"layout: {'scan-over-layers' if use_scan else 'per-layer loop'} "
          f"({model_cfg.num_hidden_layers} layers, h={model_cfg.hidden_size})")
    rng = np.random.default_rng(0)

    # compile coverage: the harness's pow-2 prompt buckets x beam settings
    buckets = (64, 128, 256, 512)
    new = 64
    compile_total = 0.0
    for beams in (1, 4):
        for p_len in buckets:
            bsz = 16
            ids = rng.integers(3, model_cfg.vocab_size, (bsz, p_len)).astype(np.int32)
            mask = np.ones((bsz, p_len), np.int32)
            gen = GenerationConfig(max_new_tokens=new, num_beams=beams,
                                   repetition_penalty=1.1, eos_token_id=-1,
                                   pad_token_id=0)
            t0 = time.perf_counter()
            generate(params, model_cfg, ids, mask, gen)  # compile + run
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = generate(params, model_cfg, ids, mask, gen)
            dt = time.perf_counter() - t0
            compile_total += max(t_compile - dt, 0.0)
            toks = bsz * new
            print(f"bucket={p_len} beams={beams}: compile+1st {t_compile:6.1f}s, "
                  f"steady {dt:5.2f}s -> {toks/dt:6.0f} tok/s/chip "
                  f"({dt/new*1e3:5.1f} ms/step)")
    print(f"TOTAL compile time over {2*len(buckets)} (bucket, beams) programs: "
          f"{compile_total:.1f}s (amortised across all datasets; persisted "
          f"across runs via the XLA compilation cache)")


if __name__ == "__main__":
    main()
