"""Generation throughput on the real chip (KV-cache greedy + beam-4).
Run: python tools/decode_bench.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_cfg
from sparse_matrix_tuning_tpu.eval.generate import GenerationConfig, generate
from sparse_matrix_tuning_tpu.models.llama import init_params


def main():
    model_cfg, _, _ = bench_cfg(small=False)
    params = init_params(jax.random.PRNGKey(0), model_cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    for bsz, beams, new in [(16, 1, 128), (16, 4, 128), (64, 1, 128)]:
        p_len = 128
        ids = rng.integers(3, model_cfg.vocab_size, (bsz, p_len)).astype(np.int32)
        mask = np.ones((bsz, p_len), np.int32)
        gen = GenerationConfig(max_new_tokens=new, num_beams=beams,
                               repetition_penalty=1.1, eos_token_id=-1,
                               pad_token_id=0)
        generate(params, model_cfg, ids, mask, gen)  # compile
        t0 = time.perf_counter()
        out = generate(params, model_cfg, ids, mask, gen)
        dt = time.perf_counter() - t0
        toks = bsz * new
        print(f"bs={bsz} beams={beams} new={new}: {dt:.2f}s -> "
              f"{toks/dt:.0f} tok/s/chip ({dt/new*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
