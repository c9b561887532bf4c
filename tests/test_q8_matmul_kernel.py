"""Fused q8 matmul kernel (ops/pallas/q8_matmul.py) vs the XLA form."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.pallas.q8_matmul import (
    q8_matmul_fused, q8_matmul_t_fused, supported_shape)
from sparse_matrix_tuning_tpu.ops.quant import (
    q8_matmul, q8_matmul_t, quantize_weight)

T, O, K = 512, 512, 1024  # one tile each — interpret mode stays fast


@pytest.fixture(scope="module")
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (T, K), jnp.bfloat16)
    w = jax.random.normal(k2, (O, K), jnp.bfloat16) * 0.02
    wq, sw = quantize_weight(w)
    return x, wq, sw


def test_supported_shape():
    assert supported_shape(8192, 4096, 14336)
    assert supported_shape(8192, 14336, 4096)
    assert supported_shape(8192, 32000, 4096)    # vocab head: BO drops to 256
    assert supported_shape(8192, 128256, 4096)   # Llama-3 vocab
    assert not supported_shape(100, 512, 1024)   # ragged T
    assert not supported_shape(512, 500, 1024)   # ragged O


def test_t_matches_xla(data):
    x, wq, sw = data
    ref = q8_matmul_t(x, wq, sw)
    out = q8_matmul_t_fused(x, wq, sw)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2,
                               atol=1e-4)
    # int32 accumulation is exact; the fp32 epilogue is the same expression
    # -> expect bitwise equality, not just allclose
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))


def test_g_matches_xla(data):
    x, wq, sw = data
    g = x[:, :O].astype(jnp.bfloat16)
    ref = q8_matmul(g, wq, sw)
    out = q8_matmul_fused(g, wq, sw)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))


def test_multi_tile_grid(data):
    """More than one tile in every grid dim (T=1024, O=1024, K=2048)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (1024, 2048), jnp.bfloat16)
    w = jax.random.normal(k2, (1024, 2048), jnp.bfloat16) * 0.02
    wq, sw = quantize_weight(w)
    ref = q8_matmul_t(x, wq, sw)
    out = q8_matmul_t_fused(x, wq, sw)
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))


def test_batched_leading_dims(data):
    x, wq, sw = data
    x3 = x.reshape(2, T // 2, K)
    # leading dims collapse to T=512 -> still tiles
    out = q8_matmul_t_fused(x3, wq, sw)
    ref = q8_matmul_t(x3, wq, sw)
    assert out.shape == ref.shape == (2, T // 2, O)
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))
