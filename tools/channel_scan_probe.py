"""Channel-mode scan phase at bench geometry on the real chip (VERDICT r2
next-step #2 'done' criterion): h=4096/f=14336 Llama-3-8B widths training
selected input-channel columns through the int8 frozen base + host-offload
+ scan-over-layers stack, one 16G v5e chip.

Usage:  python tools/channel_scan_probe.py [--layers N] [--channels K]
        [--bf16]

Builds the scan channel state directly on device (weights generated and
quantized layer-by-layer, like bench.py smt_big), runs a few steps, prints
sec/step + live HBM. Reference capability being matched at scale:
channel sparsity training, smt.py:185-296 / fine_tune.py:406-575.
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    layers = int(sys.argv[sys.argv.index("--layers") + 1]) \
        if "--layers" in sys.argv else 3
    n_ch = int(sys.argv[sys.argv.index("--channels") + 1]) \
        if "--channels" in sys.argv else 64
    use_q8 = "--bf16" not in sys.argv

    from sparse_matrix_tuning_tpu.utils.jax_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparse_matrix_tuning_tpu.config import SMTConfig
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule
    from sparse_matrix_tuning_tpu.smt.plan import LinearPlan, SMTPlan
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        build_scan_sparse_step, stack_plan_indices)
    from sparse_matrix_tuning_tpu.utils.throughput import live_hbm_bytes

    H, F, VOCAB, HKV, L = 4096, 14336, 32000, 8, layers
    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=H, intermediate_size=F,
                      num_hidden_layers=L, num_attention_heads=32,
                      num_key_value_heads=HKV, max_position_embeddings=2048,
                      tie_word_embeddings=True)
    bsz, seq = 8, 1024
    smt = SMTConfig(data_path=["p.json"], model_name_or_path="p",
                    dtype="bf16", channel_sparsity=True,
                    matrix_sparsity=False, full_ft_steps=0,
                    num_attention_channel=n_ch, num_mlp_channel=n_ch,
                    smt_lr=1e-5, ft_learning_rate=1e-5,
                    lr_scheduler_type="constant", eval_step=0, save_steps=0,
                    max_seq_len=seq, seq_buckets=[seq], scan_layers="on",
                    sparse_gradient_checkpointing=True,
                    frozen_quant="int8" if use_q8 else "none")

    rng = np.random.default_rng(0)
    mods = {"q_proj": (H, H), "k_proj": (HKV * 128, H),
            "v_proj": (HKV * 128, H), "o_proj": (H, H),
            "gate_proj": (F, H), "up_proj": (F, H), "down_proj": (H, F)}
    planned = ("q_proj", "gate_proj", "down_proj")
    linears = {}
    for li in range(L):
        for mod in planned:
            o, i = mods[mod]
            chans = tuple(sorted(rng.choice(i, n_ch, replace=False).tolist()))
            linears[f"{li}.{mod}"] = LinearPlan(mod, li, o, i,
                                                channels=chans)
    plan = SMTPlan(mode="channel", linears=linears)
    idx = stack_plan_indices(plan, L)

    def gen_quant(key, ci, shape):
        w = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        wq, sw = quantize_weight(w)
        t = jnp.take(w, ci, axis=1).astype(jnp.float32)
        wd = wq.astype(jnp.float32) * sw[:, None]
        return wq, sw, t, jnp.take(wd, ci, axis=1)

    gen_quant = jax.jit(gen_quant, static_argnums=(2,))
    key = jax.random.PRNGKey(0)
    q, trainable, base = {}, {}, {}
    total_params = VOCAB * H + H
    zero_idx = jnp.zeros((1,), jnp.int32)
    for mod, (o, i) in mods.items():
        total_params += L * o * i
        meta = idx.get(mod)
        wqs, sws, ts, bs = [], [], [], []
        for l in range(L):
            key, sub = jax.random.split(key)
            ci = meta["ci"][l] if meta is not None else zero_idx
            wq, sw, t_, b_ = gen_quant(sub, ci, (o, i))
            wqs.append(wq)
            sws.append(sw)
            if meta is not None:
                ts.append(t_)
                bs.append(b_)
        q[mod] = {"wq": jnp.stack(wqs), "sw": jnp.stack(sws)}
        if meta is not None:
            trainable[mod] = jnp.stack(ts)
            base[mod] = jnp.stack(bs)

    stacked = {n: jnp.ones((L, H), jnp.bfloat16)
               for n in ("input_layernorm", "post_attention_layernorm")}
    for mod in mods:  # host-offloaded placeholders
        stacked[mod] = jnp.zeros((L, 1), jnp.bfloat16)
    key, k1 = jax.random.split(key)
    state = {
        "params": {
            "embed_tokens": jax.random.normal(k1, (VOCAB, H),
                                              jnp.bfloat16) * 0.02,
            "norm": jnp.ones((H,), jnp.bfloat16),
            "layers_stacked": stacked,
        },
        "trainable": trainable, "base": base, "idx": idx,
        "m": jax.tree.map(jnp.zeros_like, trainable),
        "v": jax.tree.map(jnp.zeros_like, trainable),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }
    if use_q8:
        state["q"] = q

    step_fn = jax.jit(build_scan_sparse_step(
        smt, cfg, plan, make_lr_schedule("constant", 1e-5, 0, 100)),
        donate_argnums=(0,))

    ids = rng.integers(3, VOCAB, (bsz, seq)).astype(np.int32)
    labels = ids.copy()
    labels[:, : seq // 4] = -100
    batch = {"input_ids": ids, "labels": labels,
             "attention_mask": np.ones_like(ids)}

    t0 = time.perf_counter()
    state, m = step_fn(state, batch)
    print(f"first step (incl compile): {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}")
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        state, m = step_fn(state, batch)
    loss = float(m["loss"])
    sec = (time.perf_counter() - t0) / n
    print(f"channel scan {'int8' if use_q8 else 'bf16'}: L={L} n_ch={n_ch} "
          f"sec/step={sec:.4f} tok/s={bsz * seq / sec:.0f} "
          f"loss={loss:.4f} live_hbm={live_hbm_bytes() / 2**30:.2f}G "
          f"params={total_params / 1e9:.2f}B "
          f"trainable={plan.trainable_params:,}")


if __name__ == "__main__":
    main()
