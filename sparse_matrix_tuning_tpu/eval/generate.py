"""Batched autoregressive generation in pure JAX: greedy, beam search, and
ancestral sampling (temperature / top-k / top-p, HF warper order) with KV
cache, repetition penalty, and EOS handling.

Replaces the reference's HF `model.generate` usage
(evaluation/run_commonsense_parallel.py:154-160 with
GenerationConfig(num_beams=4, do_sample=False, repetition_penalty=1.1)
:257-265). Prompts are LEFT-padded as in the reference (:233).

Beam search (eval/_beam_impl.py) implements exact HF BeamSearchScorer
semantics: a separate finished-hypothesis set per batch element, slot
refill from the 2*K candidate pool after an EOS, the rank<K EOS gate, and
length-penalty normalisation by (prompt_len + generated_len) **
length_penalty (HF's decoder-only convention). Greedy/beam outputs match
HF generate token-for-token on the parity tests (tests/test_generate.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import (
    LlamaConfig, forward_with_cache, init_cache, stack_layers,
)

NEG_INF = -1.0e9


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    num_beams: int = 1
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    eos_token_id: int = 2
    pad_token_id: int = 0
    # "int8" stores the KV cache quantized (per-slot-per-head scales,
    # models/llama.init_cache): half the cache HBM + read traffic — the
    # long-context decode lever (weights are already int8/int4 via
    # frozen_quant; past ~2k slots the cache read dominates the step).
    cache_dtype: str = "bfloat16"
    # Sampling (serving surface beyond the reference's do_sample=False
    # harness): HF logits-processor order — repetition penalty, then
    # temperature, then top-k, then top-p. num_beams must be 1.
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0      # 1.0 = disabled
    seed: int = 0


def _apply_repetition_penalty(logits, seen, penalty: float):
    """HF semantics: scores>0 divided by penalty, scores<0 multiplied, for
    every token already present in the sequence."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _filter_logits(logits, top_k: int, top_p: float):
    """HF TopK/TopP warper semantics on (B, V) logits.

    top-k: mask everything strictly below the k-th largest logit (ties with
    the k-th value survive, as in HF's `logits < top_k_values[..., -1]`).
    top-p: keep the smallest set of highest-probability tokens whose
    cumulative mass reaches top_p — token i (descending order) is kept iff
    the mass strictly before it is <= top_p, which always keeps the top-1
    (HF's shifted `cumulative_probs > top_p` removal).
    """
    if top_k and top_k > 0:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        desc = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(desc, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(before <= top_p, desc, jnp.inf)
        kth = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, NEG_INF, logits)
    return logits


def _scatter_seen(seen, tokens):
    """Mark token ids as seen. tokens: (B,) or (B, S)."""
    if tokens.ndim == 1:
        tokens = tokens[:, None]
    b = seen.shape[0]
    rows = jnp.repeat(jnp.arange(b)[:, None], tokens.shape[1], axis=1)
    return seen.at[rows.reshape(-1), tokens.reshape(-1)].set(True)


# Prefill chunking: cap tokens per forward_with_cache call. Bounds the
# prefill activation footprint (scores are B*chunk*max_len fp32) and the
# per-program size — the axon AOT compile helper reproducibly dies on
# one-shot prefill programs past ~28k total rows (b8 x p3840+; bisected in
# tools/long_prompt_compile_probe.py). The chunks trace as identical
# subcomputations inside the one jitted generate program.
PREFILL_MAX_ROWS = 16384
# Second cap: keep any materialised prefill scores buffer
# (batch x heads x chunk x max_len fp32) under 2 GB. Past 4096 cache slots
# XLA stops streaming-fusing the scores chain on this runtime and the
# 8.6 GB buffer crashes the axon AOT compile helper (exact 4096/4097
# boundary, tools/long_prompt_compile_probe.py) — and >2^31-byte buffers
# are a compiler hazard everywhere.
PREFILL_SCORES_ELEMS = 1 << 29


def _prefill(params, model_cfg, input_ids, attention_mask, gen, batch):
    p_len = input_ids.shape[1]
    max_len = p_len + gen.max_new_tokens
    cache = init_cache(model_cfg, batch, max_len, dtype=jnp.dtype(gen.cache_dtype),
                       stacked="layers_stacked" in params)
    slot_mask = jnp.zeros((batch, max_len), jnp.int32)
    slot_mask = jax.lax.dynamic_update_slice(slot_mask, attention_mask.astype(jnp.int32), (0, 0))
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    # last_only: full-prompt logits are b*p_len*V fp32 of discarded HBM
    # (8.4 GB at 8B/p2048) and ~p_len times the head matmul FLOPs
    from sparse_matrix_tuning_tpu.models.llama import _use_cached_attn
    if _use_cached_attn(model_cfg, max_len):
        # Pallas cached-attention keeps scores VMEM-only — no materialised
        # buffer to cap, so only the program-size rows cap applies
        scores_cap = p_len
    else:
        scores_cap = PREFILL_SCORES_ELEMS // (
            batch * model_cfg.num_attention_heads * max_len)
    chunk = min(p_len, max(128, PREFILL_MAX_ROWS // batch),
                max(128, scores_cap))
    for s in range(0, p_len, chunk):
        e = min(s + chunk, p_len)
        # full slot_mask is safe mid-prompt: the causal term restricts
        # chunk token i to slots <= s + i < e, all already written
        logits, cache = forward_with_cache(
            params, input_ids[:, s:e], model_cfg, cache, s, slot_mask,
            positions[:, s:e], last_only=True)
    last_logits = logits[:, -1, :]  # left padding -> last slot is real
    real_len = attention_mask.sum(axis=-1).astype(jnp.int32)  # (B,)
    seen = jnp.zeros((batch, model_cfg.vocab_size), bool)
    seen = _scatter_seen(seen, input_ids)
    return cache, slot_mask, last_logits, real_len, seen, p_len


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 4))
def _greedy(params, model_cfg: LlamaConfig, input_ids, attention_mask,
            gen: GenerationConfig, sample_key=None):
    """Single-beam decode loop: greedy argmax, or (gen.do_sample) ancestral
    sampling with temperature / top-k / top-p in HF warper order."""
    b, p_len = input_ids.shape
    (cache, slot_mask, last_logits, real_len, seen,
     p_len) = _prefill(params, model_cfg, input_ids, attention_mask, gen, b)

    def body(carry, t):
        cache, slot_mask, last_logits, seen, finished, key = carry
        logits = _apply_repetition_penalty(last_logits, seen, gen.repetition_penalty)
        if gen.do_sample:
            if gen.temperature != 1.0:
                logits = logits / max(gen.temperature, 1e-6)
            logits = _filter_logits(logits, gen.top_k, gen.top_p)
            key, sub = jax.random.split(key)
            token = jax.random.categorical(sub, logits).astype(jnp.int32)
        else:
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        token = jnp.where(finished, gen.pad_token_id, token)
        now_finished = finished | (token == gen.eos_token_id)

        seen = _scatter_seen(seen, token)
        slot = p_len + t
        slot_mask = slot_mask.at[:, slot].set((~finished).astype(jnp.int32))
        positions = (real_len + t)[:, None]
        new_logits, cache = forward_with_cache(
            params, token[:, None], model_cfg, cache, slot, slot_mask, positions)
        return (cache, slot_mask, new_logits[:, -1, :], seen, now_finished,
                key), token

    key = (sample_key if sample_key is not None
           else jax.random.PRNGKey(gen.seed))
    init = (cache, slot_mask, last_logits, seen, jnp.zeros((b,), bool), key)
    _, tokens = jax.lax.scan(body, init, jnp.arange(gen.max_new_tokens))
    return tokens.T  # (B, max_new_tokens)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _beam(params, model_cfg: LlamaConfig, input_ids, attention_mask,
          gen: GenerationConfig):
    """Exact-HF BeamSearchScorer semantics — see eval/_beam_impl.py."""
    from sparse_matrix_tuning_tpu.eval._beam_impl import beam_search
    return beam_search(params, model_cfg, input_ids, attention_mask, gen)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def generate(params, model_cfg: LlamaConfig, input_ids, attention_mask,
             gen: GenerationConfig, call_idx: int = 0) -> np.ndarray:
    """input_ids/attention_mask: LEFT-padded (B, P) int arrays.
    Returns generated token ids (B, max_new_tokens), pad-filled after EOS.

    params may be the standard per-layer pytree or `stack_layers` output;
    the stacked layout compiles one scan body instead of L unrolled layers
    (use `prepare_decode_params` once per model, then call generate per
    batch — the eval harness does this).

    call_idx distinguishes successive sampled batches under one seed: the
    Gumbel stream is PRNGKey(seed) folded with call_idx, so batch k's draws
    are independent of batch j's (HF advances its global torch generator
    between calls; a fixed key would reuse the identical noise every batch).
    Passed as a traced key — no recompile per batch."""
    input_ids = jnp.asarray(input_ids, jnp.int32)
    attention_mask = jnp.asarray(attention_mask, jnp.int32)
    if gen.do_sample and gen.num_beams != 1:
        raise ValueError("do_sample requires num_beams=1 (sampled beam "
                         "search is not implemented, matching the harness's "
                         "do_sample=False beam settings)")
    if gen.do_sample and gen.temperature <= 0.0:
        raise ValueError(f"temperature must be > 0 when do_sample=True, got "
                         f"{gen.temperature} (HF's TemperatureLogitsWarper "
                         "rejects it too; use do_sample=False for greedy)")
    if gen.num_beams != 1:
        return np.asarray(_beam(params, model_cfg, input_ids, attention_mask,
                                gen))
    key = jax.random.fold_in(jax.random.PRNGKey(gen.seed), call_idx)
    return np.asarray(_greedy(params, model_cfg, input_ids, attention_mask,
                              gen, key))


def prepare_decode_params(params, model_cfg: LlamaConfig):
    """Stack per-layer params once for scan-over-layers decoding."""
    if "layers_stacked" in params:
        return params
    return stack_layers(params, model_cfg)


def decode_params_from_scan(state, model_cfg: LlamaConfig,
                            host_frozen=None, frozen_quant: str = "int8",
                            consume: bool = False):
    """Decode params straight from the int8 scan TRAINING state — no bf16
    dense materialization. The frozen base stays int8 on device and the
    selected blocks/columns get their exact trained values through the same
    delta corrections the training forward used, so prefill logits equal
    the training-eval forward's logits. This closes the loop the reference
    cannot: its eval reloads an fp16 export (run_commonsense_parallel.py:
    124-141); here an 8B model trained on one 16G chip is also *evaluated*
    on it (bf16 dense weights would need ~16G alone).

    state: scan trainer state with "q" (int8 frozen base), "trainable",
    "base", "idx" (see train/scan_phase.py). host_frozen: the trainer's
    host-offload dict; required to restore an offloaded untied lm_head
    (decode keeps the exact bf16 head, like exports — q_head is a
    training-only artifact).

    frozen_quant="int4" requantizes the frozen base to the nibble-packed
    int4 layout (scan_phase.requantize_scan_base_int4): decode is HBM-bound
    on the weight read, so halving the bytes buys both throughput (fused
    Pallas unpack-matmul, ops/pallas/q4_matmul.py) and capacity; the
    selected blocks/columns stay exact via re-gathered base values, only
    the frozen remainder carries int4 noise. consume=True frees each int8
    module during conversion (state becomes decode-only)."""
    if "q" not in state:
        raise ValueError("decode_params_from_scan needs an int8 scan state "
                         "(state['q'] missing — frozen_quant=none trainers "
                         "decode from merged_params instead)")
    p = dict(state["params"])
    if not model_cfg.tie_word_embeddings:
        head = p.get("lm_head")
        if head is None or head.ndim != 2:
            if host_frozen is None or "lm_head" not in host_frozen:
                raise ValueError(
                    "untied lm_head was host-offloaded; pass host_frozen "
                    "(trainer._host_frozen) so the exact bf16 head can be "
                    "restored for decoding")
            from sparse_matrix_tuning_tpu.train.convert import (
                host_frozen_global)
            p["lm_head"] = jnp.asarray(
                host_frozen_global(host_frozen["lm_head"]))
    if frozen_quant == "int4":
        from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import (
            LANE, build_scale_strips, pad_packed)
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            requantize_scan_base_int4)
        q4, base4 = requantize_scan_base_int4(state, consume=consume)
        # stacked-kernel layout (built ONCE here): K-tile-padded packed
        # stack + transposed scale strips, so the decode scan can index
        # layers inside the kernel via scalar prefetch instead of slicing
        # (slicing materialises a full per-layer weight copy every decode
        # step — see ops/pallas/q4_matmul.py stacked notes).
        for mod, qm in q4.items():
            w4, s4 = qm["w4"], qm["s4"]
            o, k = w4.shape[1], w4.shape[2]
            conforms = (k % LANE == 0
                        and s4.shape[-1] == 2 * (k // LANE)
                        and o % 128 == 0)
            if conforms:
                qm["w4p"] = pad_packed(w4)
                slt, sht = jax.vmap(lambda s: build_scale_strips(s, k))(s4)
                qm["slt"], qm["sht"] = slt, sht
        p["layers_q8"] = {"q": q4,
                          "t": state.get("trainable", {}),
                          "idx": state.get("idx", {}),
                          "base": base4}
        return p
    if frozen_quant != "int8":
        raise ValueError(f"frozen_quant {frozen_quant!r}: decode supports "
                         "'int8' (exact base) or 'int4' (packed)")
    p["layers_q8"] = {"q": state["q"],
                      "t": state.get("trainable", {}),
                      "idx": state.get("idx", {}),
                      "base": state.get("base", {})}
    return p
