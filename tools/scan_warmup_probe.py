"""Compile-time probe: scan vs unrolled WARM-UP step at 32-layer depth
(thin h=512 model so fp32 warm-up state fits one chip; compile scaling is
what's measured — the depth dimension, not width).
Run: python tools/scan_warmup_probe.py [scan|unrolled] [L]
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import numpy as np
    from bench import enable_compilation_cache, make_batch
    enable_compilation_cache()
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    which = sys.argv[1] if len(sys.argv) > 1 else "scan"
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg_m = LlamaConfig(vocab_size=32000, hidden_size=512,
                        intermediate_size=2048, num_hidden_layers=L,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=2048)
    bsz, seq = 8, 1024
    cfg = SMTConfig(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
                    matrix_sparsity=True, full_ft_steps=100,
                    downsample_attention_blocks_ratio=0.0084,
                    downsample_mlp_blocks_ratio=0.0084,
                    ft_learning_rate=1e-5, smt_lr=1e-5,
                    lr_scheduler_type="constant", eval_step=0, save_steps=0,
                    max_seq_len=seq, seq_buckets=[seq],
                    saliency_accumulation="per_step_stats",
                    scan_layers="on" if which == "scan" else "off")
    params = init_params(jax.random.PRNGKey(0), cfg_m)
    t = SMTTrainer(cfg, cfg_m, params, total_steps=200)
    print(f"{which}: scan_warmup={t._scan_warmup}", flush=True)
    batch = make_batch(cfg_m, bsz, seq)
    t0 = time.time()
    m = t.train_step(batch)
    print(f"{which} L={L}: first warm-up step (compile) "
          f"{time.time()-t0:.0f}s loss={float(m['loss']):.3f}", flush=True)
    t0 = time.time()
    for _ in range(3):
        m = t.train_step(batch)
    float(m["loss"])
    print(f"{which} L={L}: steady {(time.time()-t0)/3:.4f} s/step", flush=True)


if __name__ == "__main__":
    main()
