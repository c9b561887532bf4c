"""Exact-HF beam search body (factored out of eval/generate.py).

Implements transformers' BeamSearchScorer semantics:
  * per step, take the top 2K of the K*V continuation scores;
  * EOS candidates ranked < K are moved into a per-batch finished-hypothesis
    set (score normalised by padded-sequence-length ** length_penalty, the
    decoder-only convention); EOS candidates ranked >= K are dropped;
  * the K beam slots refill with the best NON-EOS continuations, so active
    beams never idle;
  * at the end, still-active beams are added as hypotheses and the best
    normalised hypothesis wins.
Run-to-max-steps is equivalent to HF's early-stopping=False termination
check: later steps can only add candidate hypotheses, never remove them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sparse_matrix_tuning_tpu.models.llama import (
    LlamaConfig, cache_batch_axis, forward_with_cache,
)

NEG_INF = -1.0e9


@partial(jax.jit, static_argnums=(1, 4))
def beam_search(params, model_cfg: LlamaConfig, input_ids, attention_mask,
                gen):
    from sparse_matrix_tuning_tpu.eval.generate import (
        _apply_repetition_penalty, _prefill, _scatter_seen)

    b, p_len = input_ids.shape
    k = gen.num_beams
    bk = b * k
    # KV-cache leaves carry batch on axis 0 (per-layer) or 1 (stacked scan
    # layout, where axis 0 is the layer dim)
    cax = cache_batch_axis(params)

    def tile(x):
        return jnp.repeat(x, k, axis=0)

    (cache, slot_mask, last_logits, real_len, seen,
     p_len) = _prefill(params, model_cfg, input_ids, attention_mask, gen, b)
    cache = jax.tree.map(lambda x: jnp.repeat(x, k, axis=cax), cache)
    slot_mask = tile(slot_mask)
    last_logits = tile(last_logits)
    real_len = tile(real_len)
    seen = tile(seen)

    beam_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b,))
    emitted = jnp.full((bk, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    hyp_norm = jnp.full((b, k), NEG_INF, jnp.float32)
    hyp_tokens = jnp.full((b, k, gen.max_new_tokens), gen.pad_token_id, jnp.int32)

    def body(carry, t):
        (cache, slot_mask, last_logits, seen, beam_scores, emitted,
         hyp_norm, hyp_tokens) = carry

        # HF beam search: processors run on log-softmaxed scores
        logprobs = jax.nn.log_softmax(last_logits, axis=-1)     # (BK, V)
        logprobs = _apply_repetition_penalty(logprobs, seen,
                                             gen.repetition_penalty)
        v = logprobs.shape[-1]
        total = (beam_scores[:, None] + logprobs).reshape(b, k * v)
        scores2k, idx2k = jax.lax.top_k(total, 2 * k)            # (B, 2K)
        token2k = (idx2k % v).astype(jnp.int32)
        src2k = idx2k // v                                        # (B, 2K)
        is_eos = token2k == gen.eos_token_id

        # --- finished hypotheses: EOS candidates with rank < K -----------
        rank = jax.lax.broadcasted_iota(jnp.int32, (b, 2 * k), 1)
        eligible = is_eos & (rank < k)
        # hyp sequence = source beam's emitted tokens + eos at position t,
        # normalised by the padded width at add time (p_len + t), the HF
        # decoder-only convention (input_ids width when add() is called)
        width = jnp.maximum(p_len + t, 1).astype(jnp.float32)
        cand_norm = jnp.where(eligible,
                              scores2k / width ** gen.length_penalty, NEG_INF)
        src_flat = (jnp.arange(b)[:, None] * k + src2k).reshape(-1)
        cand_tokens = jnp.take(emitted, src_flat, axis=0).reshape(
            b, 2 * k, gen.max_new_tokens)
        cand_tokens = cand_tokens.at[:, :, t].set(
            jnp.where(eligible, token2k, gen.pad_token_id))

        all_norm = jnp.concatenate([hyp_norm, cand_norm], axis=1)       # (B, 3K)
        all_tokens = jnp.concatenate([hyp_tokens, cand_tokens], axis=1)  # (B, 3K, T)
        top_norm, top_i = jax.lax.top_k(all_norm, k)
        hyp_norm = top_norm
        hyp_tokens = jnp.take_along_axis(all_tokens, top_i[:, :, None], axis=1)

        # --- refill the K beam slots with the best non-EOS candidates -----
        order = jnp.argsort(is_eos, axis=1, stable=True)          # non-eos first
        sel = order[:, :k]                                        # (B, K)
        token = jnp.take_along_axis(token2k, sel, axis=1)
        src = jnp.take_along_axis(src2k, sel, axis=1)
        beam_scores = jnp.take_along_axis(scores2k, sel, axis=1).reshape(-1)

        flat_beam = (jnp.arange(b)[:, None] * k + src).reshape(-1)
        token_flat = token.reshape(-1)
        cache = jax.tree.map(lambda x: jnp.take(x, flat_beam, axis=cax), cache)
        slot_mask = jnp.take(slot_mask, flat_beam, axis=0)
        seen = jnp.take(seen, flat_beam, axis=0)
        emitted = jnp.take(emitted, flat_beam, axis=0).at[:, t].set(token_flat)
        rl = jnp.take(real_len, flat_beam, axis=0)

        seen = _scatter_seen(seen, token_flat)
        slot = p_len + t
        slot_mask = slot_mask.at[:, slot].set(1)
        positions = (rl + t)[:, None]
        new_logits, cache = forward_with_cache(
            params, token_flat[:, None], model_cfg, cache, slot, slot_mask,
            positions)

        carry = (cache, slot_mask, new_logits[:, -1, :], seen, beam_scores,
                 emitted, hyp_norm, hyp_tokens)
        return carry, None

    init = (cache, slot_mask, last_logits, seen, beam_scores, emitted,
            hyp_norm, hyp_tokens)
    (cache, slot_mask, last_logits, seen, beam_scores, emitted,
     hyp_norm, hyp_tokens), _ = jax.lax.scan(
        body, init, jnp.arange(gen.max_new_tokens))

    # finalize: still-active beams become hypotheses at full width
    final_width = jnp.float32(p_len + gen.max_new_tokens)
    final_norm = (beam_scores / final_width ** gen.length_penalty).reshape(b, k)
    all_norm = jnp.concatenate([hyp_norm, final_norm], axis=1)
    all_tokens = jnp.concatenate([hyp_tokens, emitted.reshape(b, k, -1)], axis=1)
    best = jnp.argmax(all_norm, axis=1)
    return jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0, :]
