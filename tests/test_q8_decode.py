"""Int8 scan decode (eval/generate.decode_params_from_scan +
models/llama.forward_with_cache "layers_q8" branch): generation straight
from the int8 scan TRAINING state — the capability that lets an 8B model
trained on one 16G chip also run its generation eval there (bf16 dense
weights would not fit). Invariants:

  * prefill logits == the training-eval scan q8 forward's logits (same
    math: int8 base matmul + exact delta corrections);
  * incremental decode == full re-forward argmax, token for token;
  * the exact bf16 lm_head is restored from host offload (q_head stays a
    training-only artifact, matching exports);
  * channel mode works through the same branch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches

from sparse_matrix_tuning_tpu.eval.generate import (
    GenerationConfig, decode_params_from_scan, generate)
from sparse_matrix_tuning_tpu.models.llama import (
    forward_scan, forward_with_cache, init_cache)
from sparse_matrix_tuning_tpu.train.scan_phase import make_scan_dispatch


@pytest.fixture(scope="module")
def q8_trainer():
    from test_scan_phase import _train
    t, losses = _train("on", fq="int8", n=4)
    assert "q" in t.state and np.isfinite(losses).all()
    return t


def _decode_params(t):
    return decode_params_from_scan(t.state, CFG, host_frozen=t._host_frozen)


def _train_logits(t, ids, mask, mode="matrix"):
    """Training-side logits through the scan q8 forward (eval semantics)."""
    layer_xs = {"t": t.state["trainable"], "idx": t.state["idx"],
                "base": t.state["base"], "q": t.state["q"]}
    hidden = forward_scan(t.state["params"], jnp.asarray(ids), CFG,
                          layer_xs=layer_xs,
                          linear_scan=make_scan_dispatch("oracle", mode),
                          attention_mask=jnp.asarray(mask),
                          return_hidden=True)
    head = (t.state["params"]["embed_tokens"] if CFG.tie_word_embeddings
            else jnp.asarray(t._host_frozen["lm_head"]))
    return jnp.einsum("bsd,vd->bsv", hidden, head).astype(jnp.float32)


def _prefill_logits(p, ids, mask):
    b, s = ids.shape
    cache = init_cache(CFG, b, s, dtype=jnp.float32, stacked=True)
    positions = jnp.maximum(jnp.cumsum(jnp.asarray(mask), axis=-1) - 1, 0)
    logits, _ = forward_with_cache(p, jnp.asarray(ids), CFG, cache, 0,
                                   jnp.asarray(mask, jnp.int32), positions)
    return logits


def test_prefill_matches_training_forward(q8_trainer):
    t = q8_trainer
    p = _decode_params(t)
    batch = make_batches(1, bsz=2, seq=16)[0]
    got = _prefill_logits(p, batch["input_ids"], batch["attention_mask"])
    want = _train_logits(t, batch["input_ids"], batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_incremental_matches_full_forward(q8_trainer):
    """Greedy decode (KV cache) == argmax over a full q8 re-forward at every
    step — validates cache update + slot masking in the layers_q8 branch."""
    t = q8_trainer
    p = _decode_params(t)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, CFG.vocab_size, (2, 8)).astype(np.int32)
    mask = np.ones_like(prompt)
    gen = GenerationConfig(max_new_tokens=5, num_beams=1,
                           eos_token_id=-1,  # never fires
                           pad_token_id=0, cache_dtype="float32")
    got = generate(p, CFG, prompt, mask, gen)

    seq = prompt.copy()
    want = []
    for _ in range(5):
        m = np.ones_like(seq)
        logits = _train_logits(t, seq, m)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1), np.int32)
        want.append(nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(got, np.stack(want, axis=1))


def test_left_padded_batch_and_beam_run(q8_trainer):
    t = q8_trainer
    p = _decode_params(t)
    ids = np.zeros((2, 10), np.int32)
    mask = np.zeros((2, 10), np.int32)
    rng = np.random.default_rng(1)
    for i, L in enumerate((6, 9)):
        ids[i, 10 - L:] = rng.integers(3, CFG.vocab_size, L)
        mask[i, 10 - L:] = 1
    gen = GenerationConfig(max_new_tokens=4, num_beams=1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32",
                           repetition_penalty=1.1)
    out = generate(p, CFG, ids, mask, gen)
    assert out.shape == (2, 4) and (out >= 0).all()
    beam = GenerationConfig(max_new_tokens=4, num_beams=2, eos_token_id=2,
                            pad_token_id=0, cache_dtype="float32")
    out_b = generate(p, CFG, ids, mask, beam)
    assert out_b.shape == (2, 4)


def test_harness_generate_fn_accepts_q8_params(q8_trainer):
    """make_generate_fn passes q8 decode params through untouched."""
    from sparse_matrix_tuning_tpu.eval.generate import prepare_decode_params
    p = _decode_params(q8_trainer)
    assert prepare_decode_params(p, CFG) is p


def test_missing_host_head_raises(q8_trainer):
    t = q8_trainer
    if CFG.tie_word_embeddings:
        pytest.skip("tiny config is untied")
    with pytest.raises(ValueError, match="host-offloaded"):
        decode_params_from_scan(t.state, CFG, host_frozen=None)


def test_requires_q8_state(q8_trainer):
    state = {k: v for k, v in q8_trainer.state.items() if k != "q"}
    with pytest.raises(ValueError, match="int8 scan state"):
        decode_params_from_scan(state, CFG)


def test_trainer_decode_params_dispatch(q8_trainer):
    """q8 scan trainer -> layers_q8 decode params; bf16 scan trainer ->
    dense stacked params via merged_params."""
    from test_scan_phase import _train
    p = q8_trainer.decode_params()
    assert "layers_q8" in p and "layers_stacked" in p
    t_bf, _ = _train("on", fq="none", n=2)
    p_bf = t_bf.decode_params()
    assert "layers_q8" not in p_bf and "layers_stacked" in p_bf
    # dense decode params are real weights, not offload placeholders
    assert p_bf["layers_stacked"]["q_proj"].ndim == 3


def test_channel_mode_prefill_parity():
    from test_scan_channel import _train as _train_channel
    t, losses = _train_channel("on", fq="int8", n=4)
    assert "q" in t.state and np.isfinite(losses).all()
    p = _decode_params(t)
    batch = make_batches(1, bsz=2, seq=16)[0]
    got = _prefill_logits(p, batch["input_ids"], batch["attention_mask"])
    want = _train_logits(t, batch["input_ids"], batch["attention_mask"],
                         mode="channel")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
