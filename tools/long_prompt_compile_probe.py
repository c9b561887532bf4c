"""Narrow down the long-prompt decode compile failure on the axon tunnel.

kv_cache_probe's p3968 leg (4096 cache slots) reproducibly dies with
`remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1`
while p128/p1024 legs compile fine in the same process. This bisects the
prompt length and decouples prefill from the decode loop to find the wall.

Run: python tools/long_prompt_compile_probe.py [lens...]
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

B = 8


def main():
    lens = [int(a) for a in sys.argv[1:]] or [2048, 3072, 3968]
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=8,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=8192, tie_word_embeddings=True)
    state, host = synth_q8_state(cfg)
    params = decode_params_from_scan(state, cfg, host_frozen=host,
                                     frozen_quant="int4", consume=True)
    del state, host
    rng = np.random.default_rng(0)
    for p_len in lens:
        for new in (8,):
            ids = rng.integers(10, cfg.vocab_size - 10,
                               (B, p_len)).astype(np.int32)
            gen = GenerationConfig(max_new_tokens=new, num_beams=1,
                                   eos_token_id=-1, pad_token_id=0)
            t0 = time.perf_counter()
            try:
                out = generate(params, cfg, ids, np.ones_like(ids), gen)
                print(f"p{p_len} new{new}: OK "
                      f"({time.perf_counter() - t0:.0f}s incl. compile)")
            except Exception as e:
                print(f"p{p_len} new{new}: FAIL after "
                      f"{time.perf_counter() - t0:.0f}s: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
