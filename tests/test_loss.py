"""Chunked-vocab fused CE vs the full-logits loss: values and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import causal_lm_loss
from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss


@pytest.mark.parametrize("v,chunk", [(1000, 256), (512, 512), (300, 128)])
def test_chunked_matches_full(v, chunk):
    rng = np.random.default_rng(0)
    b, s, d = 2, 9, 16
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((v, d)) * 0.2, jnp.float32)
    labels = rng.integers(0, v, (b, s)).astype(np.int32)
    labels[:, :3] = -100
    labels = jnp.asarray(labels)

    logits = jnp.einsum("bsd,vd->bsv", hidden, head).astype(jnp.float32)
    want = causal_lm_loss(logits, labels)
    got = chunked_causal_lm_loss(hidden, head, labels, chunk)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_chunked_gradients_match_full():
    rng = np.random.default_rng(1)
    b, s, d, v, chunk = 2, 7, 12, 640, 256
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((v, d)) * 0.2, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, s)).astype(np.int32))

    def full(hid, hd):
        logits = jnp.einsum("bsd,vd->bsv", hid, hd).astype(jnp.float32)
        return causal_lm_loss(logits, labels)

    def chunked(hid, hd):
        return chunked_causal_lm_loss(hid, hd, labels, chunk)

    gh_f, gw_f = jax.grad(full, argnums=(0, 1))(hidden, head)
    gh_c, gw_c = jax.grad(chunked, argnums=(0, 1))(hidden, head)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_f), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_f), rtol=2e-5, atol=1e-6)


def test_all_ignored_labels():
    hidden = jnp.zeros((1, 4, 8), jnp.float32)
    head = jnp.zeros((100, 8), jnp.float32)
    labels = jnp.full((1, 4), -100, jnp.int32)
    assert float(chunked_causal_lm_loss(hidden, head, labels, 64)) == 0.0


def test_sparse_phase_loss_policy():
    """auto policy: sparse steps go dense while the fp32 logits residual
    fits the budget (fewer loss FLOPs — measured 31.7 vs 47.2 ms f+b at
    T=8192/V=32000 on v5e), chunked beyond it; non-sparse contexts keep
    the vocab-size rule; explicit loss_impl always wins."""
    import dataclasses
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    from sparse_matrix_tuning_tpu.train.steps import _use_chunked_loss
    from test_train_e2e import smt_cfg

    cfg = smt_cfg()
    v32k = dataclasses.replace(LlamaConfig.tiny(), vocab_size=32000)
    v128k = dataclasses.replace(LlamaConfig.tiny(), vocab_size=128256)
    t = 8 * 1023
    # warm-up (non-sparse): vocab rule
    assert _use_chunked_loss(cfg, v32k)
    # sparse, 32k vocab: 8192*32000*4 ~ 1.0 GiB <= 2 GiB -> dense
    assert not _use_chunked_loss(cfg, v32k, sparse=True, batch_tokens=t)
    # sparse, 128k vocab: 4.2 GiB > budget -> chunked
    assert _use_chunked_loss(cfg, v128k, sparse=True, batch_tokens=t)
    # explicit override wins both ways
    cfg_c = smt_cfg(loss_impl="chunked")
    cfg_f = smt_cfg(loss_impl="full")
    assert _use_chunked_loss(cfg_c, v32k, sparse=True, batch_tokens=t)
    assert not _use_chunked_loss(cfg_f, v128k)


# -- int8-head chunked loss (head_quant; ops/loss.py chunked_causal_lm_loss_q8)

def _q8_head_setup(seed=2, v=640, d=128, b=2, s=9):
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((v, d)) * 0.2, jnp.float32)
    labels = np.asarray(rng.integers(0, v, (b, s)), np.int32)
    labels[:, :2] = -100
    wq, sw = quantize_weight(head)
    return hidden, head, jnp.asarray(labels), wq, sw


@pytest.mark.parametrize("chunk", [256, 640, 128])
def test_chunked_q8_matches_dense_q8(chunk):
    """The chunked-q8 loss computes the SAME logit values as the dense
    frozen_q8_linear head (one shared row-quant of hidden), so the two
    losses agree to fp32 reduction order."""
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss_q8
    from sparse_matrix_tuning_tpu.ops.sparse_linear import frozen_q8_linear

    hidden, _, labels, wq, sw = _q8_head_setup()
    logits = frozen_q8_linear(hidden.astype(jnp.float32), wq, sw)
    want = causal_lm_loss(logits, labels)
    got = chunked_causal_lm_loss_q8(hidden, wq, sw, labels, chunk)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_chunked_q8_close_to_exact_head():
    """Int8 head loss is within quantization error of the exact bf16/fp32
    chunked loss on the same head."""
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss_q8

    hidden, head, labels, wq, sw = _q8_head_setup()
    exact = float(chunked_causal_lm_loss(hidden, head, labels, 256))
    q8 = float(chunked_causal_lm_loss_q8(hidden, wq, sw, labels, 256))
    assert abs(q8 - exact) < 0.05 * max(exact, 1.0)
    assert q8 != exact


def test_chunked_q8_grad_hidden():
    """Straight-through grad_hidden of the q8 chunked loss tracks the
    exact chunked loss's grad_hidden (int8 forward + int8 grad path);
    frozen operands get no gradient."""
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss_q8

    hidden, head, labels, wq, sw = _q8_head_setup()

    g_q = jax.grad(lambda h: chunked_causal_lm_loss_q8(h, wq, sw, labels, 256))(hidden)
    g_e = jax.grad(lambda h: chunked_causal_lm_loss(h, head, labels, 256))(hidden)
    g_q, g_e = np.asarray(g_q), np.asarray(g_e)
    assert np.all(np.isfinite(g_q))
    # cosine similarity per the full flattened gradient
    cos = (g_q * g_e).sum() / (np.linalg.norm(g_q) * np.linalg.norm(g_e))
    assert cos > 0.99
    # the last position gets no gradient (shifted CE) in both
    np.testing.assert_array_equal(g_q[:, -1, :], 0.0)


def test_chunked_q8_all_ignored():
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss_q8
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight

    head = jnp.asarray(np.random.default_rng(0).standard_normal((100, 8)),
                       jnp.float32)
    wq, sw = quantize_weight(head)
    hidden = jnp.zeros((1, 4, 8), jnp.float32)
    labels = jnp.full((1, 4), -100, jnp.int32)
    assert float(chunked_causal_lm_loss_q8(hidden, wq, sw, labels, 64)) == 0.0
