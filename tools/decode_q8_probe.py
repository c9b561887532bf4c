"""Int8 scan decode on the real TPU: throughput + HBM of generation straight
from the int8 scan training state (eval/generate.decode_params_from_scan).

Two phases (each a fresh process would be cleaner, but decode state is
small enough to sequence in one — bf16 L=8 first, then 8B):
  1. parity-scale (L=8, Llama-3 widths, V=32000, tied): bf16 dense stacked
     decode vs q8 decode — the bandwidth-bound decode regime should favor
     int8 weights ~2x;
  2. the 8B capability: full Llama-3-8B geometry (L=32, V=128256, untied)
     q8 decode on ONE 16G chip — bf16 dense (~16 GB weights) cannot run
     here at all.

Run: python tools/decode_q8_probe.py [--skip-8b]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import enable_compilation_cache

enable_compilation_cache()

from sparse_matrix_tuning_tpu.eval.generate import (
    GenerationConfig, decode_params_from_scan, generate)
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan, SMTPlan
from sparse_matrix_tuning_tpu.train.scan_phase import stack_plan_indices
from sparse_matrix_tuning_tpu.utils.throughput import live_hbm_bytes

B, PROMPT, NEW = 8, 128, 128


def synth_plan(cfg: LlamaConfig, seed=0) -> SMTPlan:
    rng = np.random.default_rng(seed)
    linears = {}
    H, F = cfg.hidden_size, cfg.intermediate_size
    for li in range(cfg.num_hidden_layers):
        for mod, (o, i) in (("q_proj", (H, H)), ("gate_proj", (F, H)),
                            ("down_proj", (H, F))):
            nblocks = 2 if mod == "q_proj" else 4
            grid = (o // BLOCK, i // BLOCK)
            picks = {(int(r), int(c)) for r, c in zip(
                rng.integers(0, grid[0], nblocks),
                rng.integers(0, grid[1], nblocks))}
            linears[f"{li}.{mod}"] = LinearPlan(mod, li, o, i,
                                                blocks=tuple(sorted(picks)))
    return SMTPlan(mode="matrix", linears=linears)


def synth_q8_state(cfg: LlamaConfig, seed=0):
    """Synthetic scan q8 state with the bench's selection geometry (layer-
    streamed on-device generation+quantization, like bench.py smt_big)."""
    H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    HKV, L = cfg.num_key_value_heads, cfg.num_hidden_layers
    plan = synth_plan(cfg, seed)
    idx = stack_plan_indices(plan, L)

    def gen_quant(key, rb, cb, shape):
        w = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
        wq, sw = quantize_weight(w)
        w4 = w.reshape(shape[0] // BLOCK, BLOCK, shape[1] // BLOCK, BLOCK)
        t = w4[rb, :, cb, :].astype(jnp.float32)
        wd = (wq.astype(jnp.float32) * sw[:, None]).reshape(w4.shape)
        return wq, sw, t, wd[rb, :, cb, :]

    gen_quant = jax.jit(gen_quant, static_argnums=(3,))
    hd = cfg.head_dim
    mods = {"q_proj": (H, H), "k_proj": (HKV * hd, H), "v_proj": (HKV * hd, H),
            "o_proj": (H, H), "gate_proj": (F, H), "up_proj": (F, H),
            "down_proj": (H, F)}
    key = jax.random.PRNGKey(seed)
    q, trainable, base = {}, {}, {}
    zero_idx = jnp.zeros((1,), jnp.int32)
    for mod, (o, i) in mods.items():
        meta = idx.get(mod)
        wqs, sws, ts, bs = [], [], [], []
        for l in range(L):
            key, sub = jax.random.split(key)
            rb = meta["rb"][l] if meta is not None else zero_idx
            cb = meta["cb"][l] if meta is not None else zero_idx
            wq, sw, t_, b_ = gen_quant(sub, rb, cb, (o, i))
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
    key, k1, k2 = jax.random.split(key, 3)
    params = {"embed_tokens": jax.random.normal(k1, (V, H), jnp.bfloat16) * 0.02,
              "norm": jnp.ones((H,), jnp.bfloat16),
              "layers_stacked": stacked}
    host_frozen = None
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.zeros((1,), jnp.bfloat16)  # offloaded
        host_frozen = {"lm_head": np.asarray(
            jax.random.normal(k2, (V, H), jnp.bfloat16) * 0.02)}
    state = {"params": params, "q": q, "trainable": trainable,
             "base": base, "idx": idx}
    return state, host_frozen


def bench_generate(params, cfg, label, beams=1):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (B, PROMPT)).astype(np.int32)
    mask = np.ones_like(ids)
    gen = GenerationConfig(max_new_tokens=NEW, num_beams=beams,
                           eos_token_id=-1, pad_token_id=0,
                           repetition_penalty=1.1 if beams > 1 else 1.0)
    t0 = time.perf_counter()
    generate(params, cfg, ids, mask, gen)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = generate(params, cfg, ids, mask, gen)
    dt = time.perf_counter() - t0
    assert out.shape == (B, NEW)
    tps = B * NEW / dt
    print(f"{label}: {tps:8.1f} tok/s decode ({dt*1e3/NEW:.2f} ms/step, "
          f"batch {B}, beams {beams}, compile {compile_s:.0f}s, "
          f"live HBM {live_hbm_bytes()/2**30:.2f} GB)")
    return tps


def main():
    # phase 1: L=8, both precisions fit
    cfg8 = LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=14336, num_hidden_layers=8,
                       num_attention_heads=32, num_key_value_heads=8,
                       max_position_embeddings=2048, tie_word_embeddings=True)
    state, host = synth_q8_state(cfg8)
    p_q8 = decode_params_from_scan(state, cfg8, host_frozen=host)

    # bf16 twin: dequantized dense stacked layers, same norms/embeddings
    from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight
    dense_stacked = dict(state["params"]["layers_stacked"])
    for mod, qm in state["q"].items():
        dense_stacked[mod] = jax.vmap(dequantize_weight)(qm["wq"], qm["sw"])
    p_bf = dict(state["params"])
    p_bf["layers_stacked"] = dense_stacked
    t_bf = bench_generate(p_bf, cfg8, "L=8  bf16 dense")
    del p_bf, dense_stacked
    t_q8 = bench_generate(p_q8, cfg8, "L=8  q8 corrected")
    print(f"L=8 int8-vs-bf16 decode speedup: {t_q8 / t_bf:.2f}x")
    del p_q8
    # int4 leg: nibble-packed frozen base, same exact selected blocks.
    # consume=True frees each int8 module as it converts, so peak HBM
    # stays bounded by the int8 state (the int4 copy is half its size).
    p_q4 = decode_params_from_scan(state, cfg8, host_frozen=host,
                                   frozen_quant="int4", consume=True)
    t_q4 = bench_generate(p_q4, cfg8, "L=8  q4 corrected")
    print(f"L=8 int4-vs-bf16 decode speedup: {t_q4 / t_bf:.2f}x "
          f"(vs int8 {t_q4 / t_q8:.2f}x)")
    del p_q4, state, host

    if "--skip-8b" in sys.argv:
        return
    # phase 2: the 8B capability (bf16 dense cannot run here at all)
    big = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=2048,
                      tie_word_embeddings=False)
    state, host = synth_q8_state(big)
    p = decode_params_from_scan(state, big, host_frozen=host)
    bench_generate(p, big, "8B   q8 corrected")
    # the eval harness default (beam-4 + repetition penalty): 4x the cache
    # and per-step compute, same weight traffic per step
    bench_generate(p, big, "8B   q8 beam-4   ", beams=4)
    del p
    p4 = decode_params_from_scan(state, big, host_frozen=host,
                                 frozen_quant="int4", consume=True)
    bench_generate(p4, big, "8B   q4 corrected")
    bench_generate(p4, big, "8B   q4 beam-4   ", beams=4)


if __name__ == "__main__":
    main()
