"""Op-level profile of the q8/q4 decode step on the real TPU.

Traces a short greedy decode with jax.profiler, converts the xplane with
xprof's raw_to_tool_data (framework_op_stats), and prints the top ops by
self time — the ground truth for where the decode millisecond goes,
after several rounds of microbench ghosts (see tools/q4_variant_probe.py:
skinny-matmul chains are NOT byte-bound on v5e, so effective-GB/s probes
mislead).

Run: python tools/decode_profile.py [int8|int4] [prompt_len] [cache_dtype]
"""
import glob
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

from decode_q8_probe import synth_q8_state, B, PROMPT, NEW
from sparse_matrix_tuning_tpu.eval.generate import (
    GenerationConfig, decode_params_from_scan, generate)
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "int4"
    prompt = int(sys.argv[2]) if len(sys.argv) > 2 else PROMPT
    cache_dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=8,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=8192, tie_word_embeddings=True)
    state, host = synth_q8_state(cfg)
    if quant == "bf16":
        from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight
        dense = dict(state["params"]["layers_stacked"])
        for mod, qm in state["q"].items():
            dense[mod] = jax.vmap(dequantize_weight)(qm["wq"], qm["sw"])
        params = dict(state["params"])
        params["layers_stacked"] = dense
        del state
    else:
        params = decode_params_from_scan(state, cfg, host_frozen=host,
                                         frozen_quant=quant,
                                         consume=(quant == "int4"))
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.vocab_size - 10, (B, prompt)).astype(np.int32)
    mask = np.ones_like(ids)
    gen = GenerationConfig(max_new_tokens=NEW, num_beams=1, eos_token_id=-1,
                           pad_token_id=0, cache_dtype=cache_dtype)
    generate(params, cfg, ids, mask, gen)  # compile + warm

    outdir = tempfile.mkdtemp(prefix=f"decode_prof_{quant}_")
    with jax.profiler.trace(outdir):
        generate(params, cfg, ids, mask, gen)

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane:", xplanes)
    from xprof.convert import raw_to_tool_data as rtd
    params_q = {"tqx": "request(op_profile)"}
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            out = os.path.join(outdir, tool + ".out")
            mode = "wb" if isinstance(data, (bytes, bytearray)) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, len(data))
        except Exception as e:
            print(tool, "failed:", repr(e))
    print("outdir:", outdir)


if __name__ == "__main__":
    main()
