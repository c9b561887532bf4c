"""fullk Pallas attention vs the einsum oracle (interpret mode on CPU).

Oracle = models.llama._attention with a causal mask bias — the path whose
numerics the training tests already pin. Checks fwd + all three input
grads, GQA grouping, ragged (non-128) sequence lengths, and right-padding
equivalence on the rows the loss keeps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import _attention
from sparse_matrix_tuning_tpu.ops.pallas.attention import fullk_attention


def _causal_bias(s):
    causal = np.tril(np.ones((s, s), bool))
    return jnp.asarray(
        np.where(causal, 0.0, float(np.finfo(np.float32).min))[None, None])


def _qkv(rng, b, s, hq, hkv, hd, dtype):
    q = jnp.asarray(rng.standard_normal((b, s, hq, hd)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, hd)), dtype)
    return q, k, v


@pytest.mark.parametrize("s", [128, 192])  # aligned and ragged
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_matches_einsum(s, dtype):
    b, hq, hkv, hd = 2, 4, 2, 64
    q, k, v = _qkv(np.random.default_rng(0), b, s, hq, hkv, hd, dtype)
    sm = 1.0 / float(np.sqrt(hd))

    got = fullk_attention(q, k, v, sm)
    want = _attention(q, k, v, _causal_bias(s)).reshape(b, s, hq, hd)

    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol * 5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_einsum(dtype):
    b, s, hq, hkv, hd = 2, 192, 4, 2, 64
    q, k, v = _qkv(np.random.default_rng(1), b, s, hq, hkv, hd, dtype)
    sm = 1.0 / float(np.sqrt(hd))
    bias = _causal_bias(s)
    # weight the output so every grad entry is distinct
    w = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, s, hq, hd)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(fullk_attention(q, k, v, sm).astype(jnp.float32) * w)

    def loss_oracle(q, k, v):
        o = _attention(q, k, v, bias).reshape(b, s, hq, hd)
        return jnp.sum(o.astype(jnp.float32) * w)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)

    tol = 1e-5 if dtype == jnp.float32 else 4e-2
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(wnt, np.float32),
            rtol=tol, atol=tol * 10, err_msg=f"d{name}")


def test_right_padding_rows_match_unpadded():
    # pad keys sit causally after every real query: the first s_real rows
    # of a padded batch must equal the unpadded result (the loss masks the
    # rest). This is the property that lets training skip mask_bias.
    b, s_real, pad, hq, hkv, hd = 1, 100, 28, 2, 1, 64
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, b, s_real, hq, hkv, hd, jnp.float32)
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    sm = 1.0 / float(np.sqrt(hd))

    full = fullk_attention(qp, kp, vp, sm)[:, :s_real]
    ref = fullk_attention(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_mqa_single_kv_head():
    b, s, hq, hkv, hd = 1, 128, 4, 1, 64
    q, k, v = _qkv(np.random.default_rng(4), b, s, hq, hkv, hd, jnp.float32)
    sm = 1.0 / float(np.sqrt(hd))
    got = fullk_attention(q, k, v, sm)
    want = _attention(q, k, v, _causal_bias(s)).reshape(b, s, hq, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-5)
