"""Int8 KV cache on the real TPU: long-context decode throughput + HBM.

Decode reads the ENTIRE KV cache every step, so past a couple thousand
slots the cache read rivals (then dwarfs) the weight read — the int8 cache
(models/llama.init_cache dtype int8: per-slot-per-head scales, dequant
in-register at attention) halves that traffic and the cache's HBM
footprint. This probe measures where that crosses over on the v5e:

  leg 1 (L=8 Llama-3 widths, int4 frozen base): decode at prompt lengths
        128 / 1024 / 3968 with bf16 vs int8 cache — the speedup should
        GROW with context;
  leg 2 (full 8B geometry, int4 base): prompt 2048, bs 8 — bf16 cache
        2.3 GB vs int8 1.2 GB next to the 3.5 GB packed weights.

Run: python tools/kv_cache_probe.py [--skip-8b]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np

from bench import enable_compilation_cache

enable_compilation_cache()

from decode_q8_probe import synth_q8_state  # noqa: E402
from sparse_matrix_tuning_tpu.eval.generate import (  # noqa: E402
    GenerationConfig, decode_params_from_scan, generate)
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig  # noqa: E402
from sparse_matrix_tuning_tpu.utils.throughput import live_hbm_bytes  # noqa: E402

B, NEW = 8, 128


def bench_decode(params, cfg, prompt_len, cache_dtype, label, beams=1):
    """Times a full generate AND a short one: the difference isolates pure
    decode steps from the (one-time per request) prefill, which otherwise
    dominates tok/s at long prompts and hides decode regressions."""
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.vocab_size - 10, (B, prompt_len)).astype(np.int32)
    mask = np.ones_like(ids)

    def run(new):
        gen = GenerationConfig(max_new_tokens=new, num_beams=beams,
                               eos_token_id=-1, pad_token_id=0,
                               cache_dtype=cache_dtype)
        t0 = time.perf_counter()
        out = generate(params, cfg, ids, mask, gen)
        compile_s = time.perf_counter() - t0
        assert out.shape == (B, new)
        t0 = time.perf_counter()
        generate(params, cfg, ids, mask, gen)
        return time.perf_counter() - t0, compile_s

    t_short, c1 = run(8)
    t_full, c2 = run(NEW)
    dec_ms = (t_full - t_short) / (NEW - 8) * 1e3
    prefill_ms = max(t_short * 1e3 - 8 * dec_ms, 0.0)
    toks = B * NEW / t_full
    print(f"{label}: {toks:7.1f} tok/s e2e | decode {dec_ms:6.2f} ms/step | "
          f"prefill {prefill_ms:7.1f} ms (prompt {prompt_len}, cache "
          f"{cache_dtype}, compile {c1 + c2:.0f}s, "
          f"live HBM {live_hbm_bytes() / 2**30:.2f} GB)")
    return dec_ms


def main():
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=8,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=8192, tie_word_embeddings=True)
    state, host = synth_q8_state(cfg)
    params = decode_params_from_scan(state, cfg, host_frozen=host,
                                     frozen_quant="int4", consume=True)
    del state, host
    for p_len in (128, 1024, 3968):
        t_bf = bench_decode(params, cfg, p_len, "bfloat16",
                            f"L=8 p{p_len:4d} bf16-cache")
        t_q = bench_decode(params, cfg, p_len, "int8",
                           f"L=8 p{p_len:4d} int8-cache")
        print(f"  -> int8-cache DECODE speedup at prompt {p_len}: "
              f"{t_bf / t_q:.2f}x")
    del params

    if "--skip-8b" in sys.argv:
        return
    big = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=8192,
                      tie_word_embeddings=False)
    state, host = synth_q8_state(big)
    p = decode_params_from_scan(state, big, host_frozen=host,
                                frozen_quant="int4", consume=True)
    del state
    t_bf = bench_decode(p, big, 2048, "bfloat16", "8B  p2048 bf16-cache")
    t_q = bench_decode(p, big, 2048, "int8", "8B  p2048 int8-cache")
    print(f"  -> 8B int8-cache DECODE speedup at prompt 2048: "
          f"{t_bf / t_q:.2f}x")


if __name__ == "__main__":
    main()
