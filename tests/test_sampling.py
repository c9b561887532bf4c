"""Sampling decode (do_sample + temperature/top-k/top-p).

The reference harness decodes with do_sample=False
(run_commonsense_parallel.py:257-265), so there is no reference output to
match bit-for-bit; instead these tests pin the warper SEMANTICS against a
numpy re-implementation of HF's TopKLogitsWarper/TopPLogitsWarper and the
decode-loop invariants (greedy equivalence at top_k=1, seed determinism,
EOS -> pad, support restriction).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_matrix_tuning_tpu.eval.generate import (
    GenerationConfig, _filter_logits, generate,
)
from sparse_matrix_tuning_tpu.models.hf_io import load_hf_config, load_hf_params

from test_model import hf_tiny, CFG  # noqa: F401  (fixture reuse)
from test_generate import _left_padded_prompts


def _hf_warper_reference(logits, top_k, top_p):
    """Numpy port of HF TopKLogitsWarper + TopPLogitsWarper (in that order),
    with filter_value -> -1e9 to match generate.NEG_INF."""
    out = logits.copy()
    if top_k and top_k > 0:
        k = min(top_k, out.shape[-1])
        kth = np.sort(out, axis=-1)[:, -k][:, None]
        out = np.where(out < kth, -1.0e9, out)
    if top_p < 1.0:
        order = np.argsort(-out, axis=-1)
        sorted_logits = np.take_along_axis(out, order, axis=-1)
        probs = np.exp(sorted_logits - sorted_logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        cum = np.cumsum(probs, axis=-1)
        # HF: remove where cumulative mass BEFORE the token exceeds top_p
        remove_sorted = (cum - probs) > top_p
        remove = np.zeros_like(remove_sorted)
        np.put_along_axis(remove, order, remove_sorted, axis=-1)
        out = np.where(remove, -1.0e9, out)
    return out


@pytest.mark.parametrize("top_k,top_p", [(0, 1.0), (5, 1.0), (0, 0.7),
                                         (5, 0.7), (1, 1.0), (0, 0.01)])
def test_filter_logits_matches_hf_warpers(top_k, top_p):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 37)).astype(np.float32) * 3.0
    got = np.asarray(_filter_logits(jnp.asarray(logits), top_k, top_p))
    want = _hf_warper_reference(logits, top_k, top_p)
    kept_got = got > -1.0e8
    kept_want = want > -1.0e8
    np.testing.assert_array_equal(kept_got, kept_want)
    # surviving logits pass through unchanged
    np.testing.assert_allclose(got[kept_got], logits[kept_got], rtol=1e-6)
    # top-p always keeps at least the argmax
    assert kept_got.any(axis=-1).all()


def test_topk1_equals_greedy(hf_tiny):  # noqa: F811
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids, mask = _left_padded_prompts(rng)
    greedy = generate(params, cfg, ids, mask, GenerationConfig(
        max_new_tokens=10, num_beams=1, eos_token_id=2, pad_token_id=0,
        cache_dtype="float32"))
    sampled = generate(params, cfg, ids, mask, GenerationConfig(
        max_new_tokens=10, num_beams=1, eos_token_id=2, pad_token_id=0,
        cache_dtype="float32", do_sample=True, top_k=1, seed=7))
    np.testing.assert_array_equal(sampled, greedy)


def test_seed_determinism_and_eos_pad(hf_tiny):  # noqa: F811
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids, mask = _left_padded_prompts(rng, n=2, lens=(4, 7), pmax=8)
    gen = GenerationConfig(max_new_tokens=16, num_beams=1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32",
                           do_sample=True, temperature=1.3, top_p=0.9, seed=11)
    a = generate(params, cfg, ids, mask, gen)
    b = generate(params, cfg, ids, mask, gen)
    np.testing.assert_array_equal(a, b)
    for row in a:
        eos_pos = np.where(row == 2)[0]
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == 0).all()


def test_sampling_respects_topk_support(hf_tiny):  # noqa: F811
    """Every sampled token must be inside the per-step top-k set of the
    (repetition-penalised, temperature-scaled) logits. Checked indirectly:
    with top_k=2 over many steps/seeds, the sampled token always appears in
    the top-2 of a teacher-forced rerun's logits."""
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids, mask = _left_padded_prompts(rng, n=1, lens=(6,), pmax=6)
    gen = GenerationConfig(max_new_tokens=8, num_beams=1, eos_token_id=-1,
                           pad_token_id=0, cache_dtype="float32",
                           do_sample=True, top_k=2, seed=3)
    toks = generate(params, cfg, ids, mask, gen)[0]
    # teacher-forced logits over prompt + generated prefix
    from sparse_matrix_tuning_tpu.models.llama import forward
    for t in range(len(toks)):
        seq = np.concatenate([ids[0], toks[:t]])[None, :]
        m = np.ones_like(seq)
        logits = np.asarray(forward(params, jnp.asarray(seq), cfg,
                                    jnp.asarray(m)))[0, -1]
        top2 = set(np.argsort(-logits)[:2].tolist())
        assert int(toks[t]) in top2, (t, int(toks[t]), top2)


def test_sample_with_beams_raises(hf_tiny):  # noqa: F811
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    ids = np.full((1, 4), 5, np.int64)
    mask = np.ones_like(ids)
    with pytest.raises(ValueError, match="num_beams"):
        generate(params, cfg, ids, mask, GenerationConfig(
            num_beams=4, do_sample=True, cache_dtype="float32"))
