"""Ad-hoc step-time breakdown on the real TPU chip (not part of the test
suite): quantifies forward / grad / optimizer+scatter / impl choices to
guide kernel work. Usage: python tools/profile_step.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_cfg, make_batch
from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import (causal_lm_loss, forward,
                                                   init_params)
from sparse_matrix_tuning_tpu.ops.sparse_linear import make_sparse_linear_dispatch
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model_cfg, bsz, seq = bench_cfg(small=False)
    batch = {k: jnp.asarray(v) for k, v in make_batch(model_cfg, bsz, seq).items()}

    common = dict(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
                  ft_learning_rate=1e-5, smt_lr=1e-5, lr_scheduler_type="constant",
                  eval_step=0, save_steps=0, max_seq_len=seq, seq_buckets=[seq])
    # bf16 frozen base + no offload so state["params"] keeps real dense
    # weights for the decomposition passes below (the default int8+offload
    # stack replaces them with host placeholders; the int8 step's own
    # fwd/bwd split lives in tools/q8_step_probe.py)
    cfg = SMTConfig(matrix_sparsity=True, full_ft_steps=1,
                    downsample_attention_blocks_ratio=0.0084,
                    downsample_mlp_blocks_ratio=0.0084,
                    frozen_quant="none", frozen_host_offload=False,
                    gradient_checkpointing=False, **common)
    params = init_params(jax.random.PRNGKey(0), model_cfg, dtype=cfg.param_dtype)
    trainer = SMTTrainer(cfg, model_cfg, params, total_steps=100)
    trainer.train_step(make_batch(model_cfg, bsz, seq))
    trainer.maybe_convert()
    plan = trainer.plan

    # time the full trainer step FIRST (it donates state buffers)
    nb = make_batch(model_cfg, bsz, seq)
    def full_step(b):
        return trainer.train_step(b)["loss"]
    print("full sparse step:       ", timeit(full_step, nb))

    dense = trainer.state["params"]
    trainable = trainer.state["trainable"]

    # 1. forward only (bf16 dense)
    @jax.jit
    def fwd(dense, batch):
        return causal_lm_loss(forward(dense, batch["input_ids"], model_cfg,
                                      attention_mask=batch["attention_mask"],
                                      remat=False), batch["labels"])
    print("fwd only:               ", timeit(fwd, dense, batch))

    # 2. fwd+bwd wrt trainable, oracle impl
    def make_step(impl):
        @jax.jit
        def step(trainable, dense, batch):
            def loss(tr):
                lin = make_sparse_linear_dispatch(plan, tr, impl)
                return causal_lm_loss(
                    forward(dense, batch["input_ids"], model_cfg,
                            attention_mask=batch["attention_mask"],
                            linear=lin, remat=False), batch["labels"])
            return jax.value_and_grad(loss)(trainable)
        return step

    print("fwd+bwd oracle:         ", timeit(make_step("oracle"), trainable, dense, batch))
    print("fwd+bwd pallas:         ", timeit(make_step("pallas"), trainable, dense, batch))

    # 4. full-FT fwd+bwd wrt all params (no remat) for reference
    @jax.jit
    def fullft(dense, batch):
        def loss(p):
            return causal_lm_loss(forward(p, batch["input_ids"], model_cfg,
                                          attention_mask=batch["attention_mask"],
                                          remat=False), batch["labels"])
        return jax.value_and_grad(loss)(dense)
    print("full-FT fwd+bwd noremat:", timeit(fullft, dense, batch))

    @jax.jit
    def fullft_remat(dense, batch):
        def loss(p):
            return causal_lm_loss(forward(p, batch["input_ids"], model_cfg,
                                          attention_mask=batch["attention_mask"],
                                          remat=True), batch["labels"])
        return jax.value_and_grad(loss)(dense)
    print("full-FT fwd+bwd remat:  ", timeit(fullft_remat, dense, batch))


if __name__ == "__main__":
    main()
