"""One-off: full-FT vs sparse (bf16 / int8 frozen base) step times at
8B-representative widths (h=4096, f=14336) with few layers so full-FT fp32
state fits the single 16G v5e. Decides the round-2 bench geometry.
Run: python tools/wide_bench_probe.py [L]
"""
import subprocess
import sys
import time

sys.path.insert(0, ".")


def run_phase(phase, L):
    import jax
    from bench import enable_compilation_cache, make_batch
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg_m = LlamaConfig(vocab_size=32000, hidden_size=4096,
                        intermediate_size=14336, num_hidden_layers=L,
                        num_attention_heads=32, num_key_value_heads=8,
                        max_position_embeddings=2048, tie_word_embeddings=True)
    bsz, seq = 8, 1024
    batch = make_batch(cfg_m, bsz, seq)
    common = dict(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
                  ft_learning_rate=1e-5, smt_lr=1e-5, lr_scheduler_type="constant",
                  eval_step=0, save_steps=0, max_seq_len=seq, seq_buckets=[seq])

    def timeit(trainer, iters=3):
        m = trainer.train_step(batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            m = trainer.train_step(batch)
        float(m["loss"])
        return (time.perf_counter() - t0) / iters

    if phase == "full":
        cfg = SMTConfig(matrix_sparsity=False, gradient_checkpointing=True, **common)
        params = init_params(jax.random.PRNGKey(0), cfg_m, dtype=cfg.param_dtype)
        t = SMTTrainer(cfg, cfg_m, params, total_steps=100)
        print(f"RESULT full {timeit(t):.4f}")
        return

    fq = "int8" if phase == "smt_q8" else "none"
    cfg = SMTConfig(matrix_sparsity=True, full_ft_steps=1,
                    downsample_attention_blocks_ratio=0.0084,
                    downsample_mlp_blocks_ratio=0.0084,
                    gradient_checkpointing=True,
                    sparse_gradient_checkpointing=False,
                    frozen_quant=fq, **common)
    params = init_params(jax.random.PRNGKey(0), cfg_m, dtype=cfg.param_dtype)
    t = SMTTrainer(cfg, cfg_m, params, total_steps=100)
    t.train_step(batch)
    t.maybe_convert()
    print(f"RESULT {phase} {timeit(t):.4f} trainable={t.plan.trainable_params}")


def main():
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        run_phase(sys.argv[1], L)
        return
    results = {}
    for phase in ("full", "smt", "smt_q8"):
        out = subprocess.run([sys.executable, __file__, phase, str(L)],
                             capture_output=True, text=True, timeout=1200)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                results[parts[1]] = float(parts[2])
                print(line)
        if not any(l.startswith("RESULT") for l in out.stdout.splitlines()):
            print(f"{phase} FAILED:\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}")
    if "full" in results:
        for k in ("smt", "smt_q8"):
            if k in results:
                print(f"{k}: speedup {results['full']/results[k]:.3f}x")


if __name__ == "__main__":
    main()
