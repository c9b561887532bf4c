"""Headline benchmark: SMT sparse-phase step throughput vs full-FT step
throughput on one TPU chip (BASELINE.json north star: >=2x full-FT
tokens/sec/chip at <=35% of full-FT optimizer+grad HBM, 0.86%+0.86%
sparsity).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

value        = SMT tokens/sec / full-FT tokens/sec (same model, same batch)
vs_baseline  = value / 2.0  (fraction of the 2x target; >=1.0 means met)

Why SMT wins: the sparse phase computes weight gradients only for the
selected 256x256 blocks (custom_vjp), updates Adam state proportional to
the selected fraction, and — because grads+optimizer state drop from
~14 bytes/param to ~0 — can run WITHOUT activation rematerialisation,
while full FT at this scale needs remat (the reference always enables
gradient checkpointing, fine_tune.py:192).
"""

import gc
import json
import sys
import time

import numpy as np


def bench_cfg(small: bool):
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    if small:
        return LlamaConfig.tiny(vocab_size=512), 4, 64
    # ~550M params: largest config whose full-FT (fp32 master+m+v) fits one
    # 16G v5e chip so the baseline is measurable on the same hardware
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1536, intermediate_size=4096,
        num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=8,
        max_position_embeddings=2048,
    )
    return cfg, 8, 1024


def make_batch(model_cfg, bsz, seq):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, model_cfg.vocab_size, (bsz, seq)).astype(np.int32)
    labels = ids.copy()
    labels[:, : seq // 4] = -100
    return {"input_ids": ids, "labels": labels,
            "attention_mask": np.ones_like(ids)}


def time_steps(trainer, batch, warm=1, iters=3):
    import jax
    for _ in range(warm):
        m = trainer.train_step(batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.train_step(batch)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def tree_bytes(tree):
    import jax
    return sum(x.nbytes for x in jax.tree.leaves(tree))


def main():
    small = "--small" in sys.argv
    import jax
    if small:
        jax.config.update("jax_platforms", "cpu")

    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    model_cfg, bsz, seq = bench_cfg(small)
    batch = make_batch(model_cfg, bsz, seq)
    tokens = bsz * seq
    dtype = "fp32" if small else "bf16"

    common = dict(data_path=["bench.json"], model_name_or_path="bench",
                  dtype=dtype, ft_learning_rate=1e-5, smt_lr=1e-5,
                  lr_scheduler_type="constant", eval_step=0, save_steps=0,
                  max_seq_len=seq, seq_buckets=[seq])

    # ---- full fine-tuning baseline (remat on, as the reference always does)
    cfg_full = SMTConfig(matrix_sparsity=False, gradient_checkpointing=True,
                         **common)
    params = init_params(jax.random.PRNGKey(0), model_cfg,
                         dtype=cfg_full.param_dtype)
    t_full = SMTTrainer(cfg_full, model_cfg, params, total_steps=100)
    full_sec = time_steps(t_full, batch)
    full_opt_bytes = tree_bytes({"m": t_full.state["m"], "v": t_full.state["v"],
                                 "master": t_full.state["master"]})
    del t_full, params
    gc.collect()

    # ---- SMT: 1 warm-up step, convert at 0.86%+0.86%, time the sparse phase.
    # Memory freed by SMT buys remat-free training (see module docstring).
    ratio = 0.05 if small else 0.0084
    cfg_smt = SMTConfig(matrix_sparsity=True, full_ft_steps=1,
                        downsample_attention_blocks_ratio=ratio,
                        downsample_mlp_blocks_ratio=ratio,
                        gradient_checkpointing=False, **common)
    params = init_params(jax.random.PRNGKey(0), model_cfg,
                         dtype=cfg_smt.param_dtype)
    t_smt = SMTTrainer(cfg_smt, model_cfg, params, total_steps=100)
    t_smt.train_step(batch)          # warm-up step
    t_smt.maybe_convert()
    smt_sec = time_steps(t_smt, batch)
    smt_opt_bytes = tree_bytes({"m": t_smt.state["m"], "v": t_smt.state["v"],
                                "master": t_smt.state["trainable"]})
    total_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(t_smt.state["params"]))

    speedup = full_sec / smt_sec
    result = {
        "metric": "smt_step_speedup_vs_full_ft",
        "value": round(speedup, 4),
        "unit": "x (tokens/sec/chip ratio, same model+batch)",
        "vs_baseline": round(speedup / 2.0, 4),
        "detail": {
            "model_params": total_params,
            "batch": [bsz, seq],
            "full_ft_tokens_per_sec_per_chip": round(tokens / full_sec, 1),
            "smt_tokens_per_sec_per_chip": round(tokens / smt_sec, 1),
            "full_ft_sec_per_step": round(full_sec, 4),
            "smt_sec_per_step": round(smt_sec, 4),
            "opt_state_bytes_full_ft": full_opt_bytes,
            "opt_state_bytes_smt": smt_opt_bytes,
            "opt_state_ratio": round(smt_opt_bytes / full_opt_bytes, 5),
            "trainable_fraction": round(t_smt.plan.trainable_params / total_params, 5),
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
