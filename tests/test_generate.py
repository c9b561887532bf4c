"""Generation parity vs HF transformers on the tiny model: greedy and
beam-4 with repetition penalty, left-padded batches — the decode settings
of the reference eval harness (run_commonsense_parallel.py:257-265)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sparse_matrix_tuning_tpu.eval.generate import GenerationConfig, generate
from sparse_matrix_tuning_tpu.eval.harness import extract_answer
from sparse_matrix_tuning_tpu.models.hf_io import load_hf_config, load_hf_params

from test_model import hf_tiny, CFG  # noqa: F401  (fixture reuse)


def _hf_generate(model, ids, mask, **kw):
    import torch
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            do_sample=False, pad_token_id=0, eos_token_id=2, **kw)
    return out[:, ids.shape[1]:].numpy()


def _left_padded_prompts(rng, n=3, lens=(5, 8, 11), pmax=12, vocab=256):
    ids = np.zeros((n, pmax), np.int64)
    mask = np.zeros((n, pmax), np.int64)
    for i, L in enumerate(lens):
        ids[i, pmax - L:] = rng.integers(3, vocab, L)
        mask[i, pmax - L:] = 1
    return ids, mask


@pytest.mark.parametrize("rep_penalty", [1.0, 1.1])
def test_greedy_matches_hf(hf_tiny, rep_penalty):  # noqa: F811
    model, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids, mask = _left_padded_prompts(rng)

    want = _hf_generate(model, ids, mask, max_new_tokens=12,
                        repetition_penalty=rep_penalty)
    gen = GenerationConfig(max_new_tokens=12, num_beams=1,
                           repetition_penalty=rep_penalty,
                           eos_token_id=2, pad_token_id=0, cache_dtype="float32")
    got = generate(params, cfg, ids, mask, gen)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_beam4_matches_hf(hf_tiny):  # noqa: F811
    model, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids, mask = _left_padded_prompts(rng, lens=(6, 6, 6))

    want = _hf_generate(model, ids, mask, max_new_tokens=8, num_beams=4)
    gen = GenerationConfig(max_new_tokens=8, num_beams=4,
                           eos_token_id=2, pad_token_id=0, cache_dtype="float32")
    got = generate(params, cfg, ids, mask, gen)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_eos_then_pad(hf_tiny):  # noqa: F811
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids, mask = _left_padded_prompts(rng, n=2, lens=(4, 7), pmax=8)
    gen = GenerationConfig(max_new_tokens=20, num_beams=1,
                           eos_token_id=2, pad_token_id=0, cache_dtype="float32")
    got = generate(params, cfg, ids, mask, gen)
    for row in got:
        eos_pos = np.where(row == 2)[0]
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == 0).all()


def test_extract_answer_reference_parity():
    assert extract_answer("boolq", "The answer is True.") == "true"
    assert extract_answer("piqa", "I pick Solution2 because...") == "solution2"
    assert extract_answer("social_i_qa", "answer3") == "answer3"
    assert extract_answer("hellaswag", "ending4 is right") == "ending4"
    assert extract_answer("winogrande", "option1") == "option1"
    assert extract_answer("ARC-Easy", "clearly answer5.") == "answer5"
    assert extract_answer("boolq", "no idea") == ""
    # first match wins (reference pred_answers[0])
    assert extract_answer("boolq", "false then true") == "false"


def test_extract_answer_math():
    assert extract_answer("gsm8k", "So the result is 42 dollars") == "42"
    assert extract_answer("gsm8k", "= 1,234.5.") == "1234.5"
    assert extract_answer("SVAMP", "no numbers") == ""
    assert extract_answer("AQuA", "the answer is (c)") == "c"


def test_beam4_with_repetition_penalty_matches_hf(hf_tiny):  # noqa: F811
    """The exact reference eval decode config: beam-4 + rep penalty 1.1
    (run_commonsense_parallel.py:257-265)."""
    model, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids, mask = _left_padded_prompts(rng, lens=(5, 9, 7))

    want = _hf_generate(model, ids, mask, max_new_tokens=8, num_beams=4,
                        repetition_penalty=1.1)
    gen = GenerationConfig(max_new_tokens=8, num_beams=4,
                           repetition_penalty=1.1,
                           eos_token_id=2, pad_token_id=0,
                           cache_dtype="float32")
    got = generate(params, cfg, ids, mask, gen)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_beam_with_early_eos_matches_hf(hf_tiny):  # noqa: F811
    """Force EOS to be competitive so beams finish at different times —
    exercises the finished-hypothesis bookkeeping vs HF BeamSearchScorer."""
    import torch
    model, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)

    # boost the EOS logit identically in both models
    boost = np.zeros((cfg.vocab_size, cfg.hidden_size), np.float32)
    boost[2] = np.asarray(params["norm"]) * 0.35  # correlates with hidden scale
    params["lm_head"] = params["lm_head"] + jnp.asarray(boost)
    model2 = model.__class__(model.config).eval()
    model2.load_state_dict(model.state_dict())
    with torch.no_grad():
        model2.lm_head.weight += torch.tensor(boost)

    rng = np.random.default_rng(4)
    ids, mask = _left_padded_prompts(rng, n=4, lens=(5, 9, 7, 12), pmax=12)
    want = _hf_generate(model2, ids, mask, max_new_tokens=10, num_beams=4,
                        repetition_penalty=1.1)
    gen = GenerationConfig(max_new_tokens=10, num_beams=4,
                           repetition_penalty=1.1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32")
    got = generate(params, cfg, ids, mask, gen)
    # at least one sequence must actually finish early for the test to bite
    assert (want == 2).any()

    def upto_eos(row):
        row = list(row)
        return row[: row.index(2)] if 2 in row else row

    # content up to EOS must match exactly; after EOS both emit only
    # specials (HF pads finished rows with eos, we pad with pad — identical
    # after skip_special_tokens decoding)
    for g, w in zip(got, want):
        assert upto_eos(g) == upto_eos(w)
        tail = [t for t in g[len(upto_eos(g)):] if t not in (0, 2)]
        assert tail == []


def test_stacked_decode_matches_unstacked(hf_tiny):  # noqa: F811
    """scan-over-layers decode (prepare_decode_params) must emit the same
    tokens as the per-layer loop, greedy and beam-4."""
    from sparse_matrix_tuning_tpu.eval.generate import prepare_decode_params
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    stacked = prepare_decode_params(params, cfg)
    assert "layers_stacked" in stacked and "layers" not in stacked
    rng = np.random.default_rng(7)
    ids, mask = _left_padded_prompts(rng)

    for beams in (1, 4):
        gen = GenerationConfig(max_new_tokens=10, num_beams=beams,
                               repetition_penalty=1.1, eos_token_id=2,
                               pad_token_id=0, cache_dtype="float32")
        got_loop = generate(params, cfg, ids, mask, gen)
        got_scan = generate(stacked, cfg, ids, mask, gen)
        np.testing.assert_array_equal(got_loop, got_scan)


# ---------------------------------------------------------------------------
# int8 KV cache (cache_dtype="int8")
# ---------------------------------------------------------------------------

def _prefill_logits_cache(params, cfg, ids, mask, cache_dtype):
    from sparse_matrix_tuning_tpu.models.llama import (
        forward_with_cache, init_cache)
    b, s = ids.shape
    cache = init_cache(cfg, b, s, dtype=jnp.dtype(cache_dtype),
                       stacked="layers_stacked" in params)
    positions = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    logits, cache = forward_with_cache(
        params, jnp.asarray(ids, jnp.int32), cfg, cache, 0,
        jnp.asarray(mask, jnp.int32), jnp.asarray(positions, jnp.int32))
    return np.asarray(logits), cache


def test_int8_cache_layout(hf_tiny):  # noqa: F811
    """init_cache dtype int8 builds the quantized layout (int8 k/v + fp32
    per-slot-per-head scales) in both per-layer and stacked forms."""
    from sparse_matrix_tuning_tpu.models.llama import init_cache
    cfg = load_hf_config(hf_tiny[1])
    c = init_cache(cfg, 2, 16, dtype=jnp.int8)
    lay = c["0"]
    assert lay["k"].dtype == jnp.int8 and lay["vs"].dtype == jnp.float32
    # K/V stored (B, Hkv, S, hd); scales (B, Hkv, 1, S) — the Pallas
    # cached-attention kernel's block layouts (models/llama.init_cache)
    b, hkv, s, _ = lay["k"].shape
    assert lay["ks"].shape == (b, hkv, 1, s)
    cs = init_cache(cfg, 2, 16, dtype=jnp.int8, stacked=True)
    assert cs["k"].shape[0] == cfg.num_hidden_layers
    assert cs["vs"].shape == (cfg.num_hidden_layers, b, hkv, 1, s)


def test_int8_cache_prefill_close_to_exact(hf_tiny):  # noqa: F811
    """Prefill logits through the int8 KV cache stay within quantization
    tolerance of the exact cache (error per K/V element <= scale/2 =
    max|k|/254 per head), for both per-layer and stacked layouts."""
    from sparse_matrix_tuning_tpu.eval.generate import prepare_decode_params
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids, mask = _left_padded_prompts(rng)

    want, _ = _prefill_logits_cache(params, cfg, ids, mask, "float32")
    got, cache = _prefill_logits_cache(params, cfg, ids, mask, "int8")
    tol = 0.05 * (np.abs(want).max() + 1.0)
    assert np.abs(got - want).max() < tol
    # written slots actually carry quantized payloads
    assert np.asarray(cache["0"]["ks"]).max() > 0

    stacked = prepare_decode_params(params, cfg)
    got_s, _ = _prefill_logits_cache(stacked, cfg, ids, mask, "int8")
    np.testing.assert_allclose(got_s, got, rtol=2e-4, atol=2e-4)


def test_int8_cache_generate_greedy_and_beam(hf_tiny):  # noqa: F811
    """End-to-end generation with cache_dtype='int8' (greedy + beam-4,
    per-layer and stacked): runs, emits valid ids, and greedy agrees with
    the exact cache on a large majority of steps (argmax can legitimately
    flip where the exact logits are near-tied)."""
    from sparse_matrix_tuning_tpu.eval.generate import prepare_decode_params
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids, mask = _left_padded_prompts(rng)

    gen_exact = GenerationConfig(max_new_tokens=12, num_beams=1,
                                 eos_token_id=2, pad_token_id=0,
                                 cache_dtype="float32")
    gen_q = GenerationConfig(max_new_tokens=12, num_beams=1,
                             eos_token_id=2, pad_token_id=0,
                             cache_dtype="int8")
    want = generate(params, cfg, ids, mask, gen_exact)
    got = generate(params, cfg, ids, mask, gen_q)
    assert got.shape == want.shape
    agree = (got == want).mean()
    assert agree >= 0.75, f"int8-cache greedy agreement {agree:.2f}"

    stacked = prepare_decode_params(params, cfg)
    got_s = generate(stacked, cfg, ids, mask, gen_q)
    np.testing.assert_array_equal(got_s, got)

    gen_b = GenerationConfig(max_new_tokens=6, num_beams=4, eos_token_id=2,
                             pad_token_id=0, cache_dtype="int8")
    out_b = generate(stacked, cfg, ids, mask, gen_b)
    assert out_b.shape == (ids.shape[0], 6)
    assert (out_b >= 0).all() and (out_b < cfg.vocab_size).all()


def test_chunked_prefill_matches_unchunked(hf_tiny, monkeypatch):  # noqa: F811
    """Prefill chunking (PREFILL_MAX_ROWS / PREFILL_SCORES_ELEMS caps) must
    not change generation: chunk boundaries only reorder when K/V slots are
    written, never what each token attends to."""
    import importlib
    G = importlib.import_module("sparse_matrix_tuning_tpu.eval.generate")
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    ids, mask = _left_padded_prompts(rng, lens=(9, 12, 7), pmax=12)

    gen = GenerationConfig(max_new_tokens=8, num_beams=1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32")
    want = generate(params, cfg, ids, mask, gen)

    from sparse_matrix_tuning_tpu.eval import _beam_impl

    # force 4-token chunks (3 chunks over the 12-slot prompt)
    monkeypatch.setattr(G, "PREFILL_MAX_ROWS", 4 * ids.shape[0])
    G._greedy.clear_cache()
    _beam_impl.beam_search.clear_cache()
    got = generate(params, cfg, ids, mask, gen)
    np.testing.assert_array_equal(got, want)

    gen_b = GenerationConfig(max_new_tokens=6, num_beams=4, eos_token_id=2,
                             pad_token_id=0, cache_dtype="float32")
    got_b = generate(params, cfg, ids, mask, gen_b)
    monkeypatch.setattr(G, "PREFILL_MAX_ROWS", 16384)
    G._greedy.clear_cache()
    _beam_impl.beam_search.clear_cache()
    want_b = generate(params, cfg, ids, mask, gen_b)
    np.testing.assert_array_equal(got_b, want_b)
