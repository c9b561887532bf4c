"""In-model attention impl comparison at bench size, synced via float(loss).
Run: python tools/attn_in_model.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_cfg, make_batch
from sparse_matrix_tuning_tpu.models.llama import (causal_lm_loss, forward,
                                                   init_params)


def main():
    model_cfg, bsz, seq = bench_cfg(small=False)
    params = init_params(jax.random.PRNGKey(0), model_cfg, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in make_batch(model_cfg, bsz, seq).items()}

    def make(impl, remat, grad):
        def loss(p):
            return causal_lm_loss(
                forward(p, batch["input_ids"], model_cfg,
                        attention_mask=batch["attention_mask"],
                        remat=remat, attn_impl=impl), batch["labels"])
        return jax.jit(jax.value_and_grad(loss) if grad else loss)

    def timeit(fn, iters=4):
        out = fn(params)
        float(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params)
            float(out[0] if isinstance(out, tuple) else out)
        return (time.perf_counter() - t0) / iters

    for impl in ("einsum", "flash"):
        tf = timeit(make(impl, False, False))
        tg = timeit(make(impl, False, True))
        tr = timeit(make(impl, True, True))
        print(f"{impl:7s} fwd {tf*1e3:7.1f}ms | fwd+bwd {tg*1e3:7.1f}ms | "
              f"fwd+bwd remat {tr*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
