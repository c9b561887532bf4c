"""Probe: SMT sparse phase at FULL Llama-3-8B geometry (8.03B params) on
one 16G v5e chip — int8 frozen base + host offload + scan-over-layers +
sparse-phase remat.

The bf16 params (16.06 GB) exceed HBM, so weights are generated AND
quantized layer-by-layer on device (peak transient = one layer's bf16,
~117 MB) and only the int8 copies + embeddings stay resident — the same
streaming shape a production quantize-on-load takes.
Run: python tools/big8b_probe.py [L]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, F, VOCAB = 4096, 14336, 128256
HKV = 8


def main():
    import jax
    import jax.numpy as jnp
    from bench import enable_compilation_cache, make_batch
    enable_compilation_cache()
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule
    from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan, SMTPlan
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        build_scan_sparse_step, stack_plan_indices)
    from sparse_matrix_tuning_tpu.utils.throughput import live_hbm_bytes

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    big = LlamaConfig(vocab_size=VOCAB, hidden_size=H, intermediate_size=F,
                      num_hidden_layers=L, num_attention_heads=32,
                      num_key_value_heads=HKV, max_position_embeddings=2048,
                      tie_word_embeddings=False)
    bsz, seq = 8, 1024
    cfg = SMTConfig(data_path=["b.json"], model_name_or_path="b", dtype="bf16",
                    matrix_sparsity=True, full_ft_steps=0,
                    downsample_attention_blocks_ratio=0.0084,
                    downsample_mlp_blocks_ratio=0.0084,
                    ft_learning_rate=1e-5, smt_lr=1e-5,
                    lr_scheduler_type="constant", eval_step=0, save_steps=0,
                    max_seq_len=seq, seq_buckets=[seq],
                    sparse_gradient_checkpointing=True, scan_layers="on")

    rng = np.random.default_rng(0)
    linears = {}
    for li in range(L):
        for mod, (o, i) in (("q_proj", (H, H)),
                            ("gate_proj", (F, H)),
                            ("down_proj", (H, F))):
            nblocks = 2 if mod == "q_proj" else 4
            grid = (o // 256, i // 256)
            picks = {(int(r), int(c)) for r, c in zip(
                rng.integers(0, grid[0], nblocks),
                rng.integers(0, grid[1], nblocks))}
            linears[f"{li}.{mod}"] = LinearPlan(mod, li, o, i,
                                                blocks=tuple(sorted(picks)))
    plan = SMTPlan(mode="matrix", linears=linears)
    idx = stack_plan_indices(plan, L)

    # one jitted generator+quantizer per weight shape: bf16 layer weight is
    # a transient inside the jit, only int8/scales/blocks come out
    def gen_quant(key, rb, cb, shape):
        w = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        wq, sw = quantize_weight(w)
        w4 = w.reshape(shape[0] // BLOCK, BLOCK, shape[1] // BLOCK, BLOCK)
        t = w4[rb, :, cb, :].astype(jnp.float32)
        wd = (wq.astype(jnp.float32) * sw[:, None]).reshape(w4.shape)
        b = wd[rb, :, cb, :]
        return wq, sw, t, b

    gen_quant = jax.jit(gen_quant, static_argnums=(3,))

    mods = {"q_proj": (H, H), "k_proj": (HKV * 128, H), "v_proj": (HKV * 128, H),
            "o_proj": (H, H), "gate_proj": (F, H), "up_proj": (F, H),
            "down_proj": (H, F)}
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    q, trainable, base = {}, {}, {}
    total_params = VOCAB * H * 2 + H
    zero_idx = jnp.zeros((1,), jnp.int32)
    for mod, (o, i) in mods.items():
        total_params += L * o * i
        meta = idx.get(mod)
        wqs, sws, ts, bs = [], [], [], []
        for l in range(L):
            key, sub = jax.random.split(key)
            rb = meta["rb"][l] if meta is not None else zero_idx
            cb = meta["cb"][l] if meta is not None else zero_idx
            wq, sw, t, b = gen_quant(sub, rb, cb, (o, i))
            wqs.append(wq)
            sws.append(sw)
            if meta is not None:
                ts.append(t)
                bs.append(b)
        q[mod] = {"wq": jnp.stack(wqs), "sw": jnp.stack(sws)}
        if meta is not None:
            trainable[mod] = jnp.stack(ts)
            base[mod] = jnp.stack(bs)
        print(f"  {mod} quantized {time.time()-t0:.0f}s "
              f"live {live_hbm_bytes()/2**30:.2f} GiB", flush=True)

    stacked = {n: jnp.ones((L, H), jnp.bfloat16)
               for n in ("input_layernorm", "post_attention_layernorm")}
    for mod in mods:  # offloaded placeholders
        stacked[mod] = jnp.zeros((L, 1), jnp.bfloat16)
    key, k1, k2 = jax.random.split(key, 3)
    params = {
        "embed_tokens": jax.random.normal(k1, (VOCAB, H), jnp.bfloat16) * 0.02,
        "lm_head": jax.random.normal(k2, (VOCAB, H), jnp.bfloat16) * 0.02,
        "norm": jnp.ones((H,), jnp.bfloat16),
        "layers_stacked": stacked,
    }
    state = {
        "params": params, "trainable": trainable, "base": base, "idx": idx,
        "m": jax.tree.map(jnp.zeros_like, trainable),
        "v": jax.tree.map(jnp.zeros_like, trainable),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
        "q": q,
    }
    print(f"params {total_params/1e9:.2f}B; state built {time.time()-t0:.0f}s;"
          f" live {live_hbm_bytes()/2**30:.2f} GiB", flush=True)

    step_fn = jax.jit(build_scan_sparse_step(
        cfg, big, plan, make_lr_schedule("constant", 1e-5, 0, 100)),
        donate_argnums=(0,))
    batch = make_batch(big, bsz, seq)

    t0 = time.time()
    state, m = step_fn(state, batch)
    print(f"first step (compile) {time.time()-t0:.0f}s "
          f"loss={float(m['loss']):.3f}", flush=True)
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        state, m = step_fn(state, batch)
    float(m["loss"])
    sec = (time.time() - t0) / iters
    print(f"RESULT big8b {sec:.4f} s/step  {bsz*seq/sec:.0f} tok/s/chip  "
          f"live {live_hbm_bytes()/2**30:.2f} GiB  "
          f"trainable {plan.trainable_params:,}  params {total_params/1e9:.2f}B",
          flush=True)


if __name__ == "__main__":
    main()
