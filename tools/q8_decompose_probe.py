"""Ad-hoc decomposition of the headline q8 sparse step (bench geometry,
L=3, h=4096/f=14336/V=32k tied, bs8 x seq1024) into its big components by
timing policy variants on the real chip:

  step        default stack (int8 + q8 head + fullk + offload, dense loss)
  fwd         eval forward only (same dispatch)
  head_bf16   step with head_quant=none  -> int8-head saving
  attn_einsum step with attn_impl=einsum -> fullk saving
  loss_chunk  step with loss_impl=chunked -> dense-loss saving

Each variant runs in its own subprocess (clean HBM; persistent XLA cache
makes repeats cheap). Run: python tools/q8_decompose_probe.py [variant]
"""
import subprocess
import sys
import time

sys.path.insert(0, ".")

VARIANTS = ("step", "fwd", "head_bf16", "attn_einsum", "loss_chunk")


def run_variant(variant):
    import jax
    from bench import enable_compilation_cache, make_batch
    enable_compilation_cache()
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg_m = LlamaConfig(vocab_size=32000, hidden_size=4096,
                        intermediate_size=14336, num_hidden_layers=3,
                        num_attention_heads=32, num_key_value_heads=8,
                        max_position_embeddings=2048, tie_word_embeddings=True)
    bsz, seq = 8, 1024
    batch = make_batch(cfg_m, bsz, seq)
    kw = dict(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
              ft_learning_rate=1e-5, smt_lr=1e-5, lr_scheduler_type="constant",
              eval_step=0, save_steps=0, max_seq_len=seq, seq_buckets=[seq],
              matrix_sparsity=True, full_ft_steps=1,
              downsample_attention_blocks_ratio=0.0084,
              downsample_mlp_blocks_ratio=0.0084,
              gradient_checkpointing=True,
              sparse_gradient_checkpointing=False,
              frozen_quant="int8")
    if variant == "head_bf16":
        kw["head_quant"] = "none"
    if variant == "attn_einsum":
        kw["attn_impl"] = "einsum"
    if variant == "loss_chunk":
        kw["loss_impl"] = "chunked"
    cfg = SMTConfig(**kw)
    params = init_params(jax.random.PRNGKey(0), cfg_m, dtype=cfg.param_dtype)
    t = SMTTrainer(cfg, cfg_m, params, total_steps=100)
    t.train_step(batch)
    t.maybe_convert()

    if variant == "fwd":
        def once():
            return t.evaluate([batch])[1]
    else:
        def once():
            return float(t.train_step(batch)["loss"])

    once()  # compile + warm
    once()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            once()
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    print(f"RESULT {variant} {best:.4f}")


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    res = {}
    for v in VARIANTS:
        out = subprocess.run([sys.executable, __file__, v],
                             capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res[v] = float(line.split()[2])
                print(line)
        if v not in res:
            print(f"{v} FAILED:\n{out.stdout[-1000:]}\n{out.stderr[-2000:]}")
    if "step" in res:
        s = res["step"]
        if "fwd" in res:
            print(f"bwd+opt = {s - res['fwd']:.4f}")
        for v, label in (("head_bf16", "int8-head saving"),
                         ("attn_einsum", "fullk saving"),
                         ("loss_chunk", "dense-loss saving")):
            if v in res:
                print(f"{label}: {res[v] - s:+.4f} (variant {res[v]:.4f})")


if __name__ == "__main__":
    main()
