"""Fine-grained q8-vs-bf16 timing in situ at 8B widths: forward-only and
fwd+bwd of the sparse step, isolating where the int8 gain goes.
Run: python tools/q8_step_probe.py [L]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import enable_compilation_cache, make_batch

enable_compilation_cache()

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
from sparse_matrix_tuning_tpu.ops.sparse_linear import make_sparse_linear_dispatch
from sparse_matrix_tuning_tpu.train.steps import compute_loss
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer


def timeit(fn, *a, iters=3):
    r = fn(*a)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg_m = LlamaConfig(vocab_size=32000, hidden_size=4096,
                        intermediate_size=14336, num_hidden_layers=L,
                        num_attention_heads=32, num_key_value_heads=8,
                        max_position_embeddings=2048, tie_word_embeddings=True)
    bsz, seq = 8, 1024
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_m, bsz, seq).items()}
    cfg = SMTConfig(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
                    matrix_sparsity=True, full_ft_steps=1,
                    downsample_attention_blocks_ratio=0.0084,
                    downsample_mlp_blocks_ratio=0.0084,
                    ft_learning_rate=1e-5, smt_lr=1e-5,
                    lr_scheduler_type="constant", eval_step=0, save_steps=0,
                    gradient_checkpointing=True,
                    sparse_gradient_checkpointing=False,
                    frozen_quant="int8", frozen_host_offload=False,
                    max_seq_len=seq, seq_buckets=[seq])
    params = init_params(jax.random.PRNGKey(0), cfg_m, dtype=cfg.param_dtype)
    tr = SMTTrainer(cfg, cfg_m, params, total_steps=100)
    tr.train_step(make_batch(cfg_m, bsz, seq))
    tr.maybe_convert()
    plan, state = tr.plan, tr.state
    dense = state["params"]
    trainable = state["trainable"]
    q = state["q"]

    def fwd(qw):
        @jax.jit
        def f(trainable, dense, qq, batch):
            lin = make_sparse_linear_dispatch(plan, trainable, "auto",
                                              qweights=qq if qw else None)
            return compute_loss(dense, batch, cfg, cfg_m, linear=lin, remat=False)
        if qw:
            return lambda: f(trainable, dense, q, batch)
        return lambda: f(trainable, dense, None, batch)

    def step(qw):
        @jax.jit
        def f(trainable, dense, qq, batch):
            def loss(tr_):
                lin = make_sparse_linear_dispatch(plan, tr_, "auto",
                                                  qweights=qq if qw else None)
                return compute_loss(dense, batch, cfg, cfg_m, linear=lin,
                                    remat=False)
            return jax.value_and_grad(loss)(trainable)
        if qw:
            return lambda: f(trainable, dense, q, batch)
        return lambda: f(trainable, dense, None, batch)

    t_fwd_bf = timeit(fwd(False))
    t_fwd_q8 = timeit(fwd(True))
    t_fb_bf = timeit(step(False))
    t_fb_q8 = timeit(step(True))
    print(f"fwd  bf16 {t_fwd_bf*1e3:7.1f}ms | q8 {t_fwd_q8*1e3:7.1f}ms "
          f"| speedup {t_fwd_bf/t_fwd_q8:5.2f}x")
    print(f"f+b  bf16 {t_fb_bf*1e3:7.1f}ms | q8 {t_fb_q8*1e3:7.1f}ms "
          f"| speedup {t_fb_bf/t_fb_q8:5.2f}x")
    print(f"bwd-only bf16 {(t_fb_bf-t_fwd_bf)*1e3:7.1f}ms | "
          f"q8 {(t_fb_q8-t_fwd_q8)*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
