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


def test_spmd_matches_single_device():
    """shard_map path over the fake 8-device mesh (batch over data+fsdp,
    heads over tensor): fwd + grads match the einsum oracle."""
    from sparse_matrix_tuning_tpu.ops.pallas.attention import (
        fullk_attention_spmd, fullk_supported_on_mesh)
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 2, 2))
    b, s, hq, hkv, hd = 4, 128, 4, 2, 64
    assert fullk_supported_on_mesh(mesh, b, hq, hkv)
    assert not fullk_supported_on_mesh(mesh, 3, hq, hkv)   # batch not / 4
    assert not fullk_supported_on_mesh(mesh, b, hq, 1)     # hkv not / 2

    q, k, v = _qkv(np.random.default_rng(5), b, s, hq, hkv, hd, jnp.float32)
    sm = 1.0 / float(np.sqrt(hd))
    bias = _causal_bias(s)
    w = jnp.asarray(
        np.random.default_rng(6).standard_normal((b, s, hq, hd)), jnp.float32)

    def loss_spmd(q, k, v):
        return jnp.sum(fullk_attention_spmd(q, k, v, sm, mesh) * w)

    def loss_oracle(q, k, v):
        return jnp.sum(_attention(q, k, v, bias).reshape(b, s, hq, hd) * w)

    got = fullk_attention_spmd(q, k, v, sm, mesh)
    want = _attention(q, k, v, bias).reshape(b, s, hq, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-5)

    g_got = jax.grad(loss_spmd, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-4, err_msg=f"d{name}")


def test_spmd_pre_sharded_and_resharded_inputs():
    """Under jit with inputs committed to a DIFFERENT sharding, shard_map
    must reshard and still produce the oracle result — including on the
    (2,2,2) mesh (the kernel is correct there; a CPU-backend full-model
    miscompile around the boundary is documented in test_sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sparse_matrix_tuning_tpu.ops.pallas.attention import (
        fullk_attention_spmd)
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 2, 2))
    b, s, hq, hkv, hd = 8, 64, 4, 2, 64
    q, k, v = _qkv(np.random.default_rng(7), b, s, hq, hkv, hd, jnp.float32)
    sm = 1.0 / float(np.sqrt(hd))
    want = _attention(q, k, v, _causal_bias(s)).reshape(b, s, hq, hd)
    f = jax.jit(lambda a, b_, c: fullk_attention_spmd(a, b_, c, sm, mesh))

    for spec in (P(("data", "fsdp"), None, "tensor", None),
                 P("data", None, None, None)):
        sh = NamedSharding(mesh, spec)
        args = [jax.device_put(x, sh) for x in (q, k, v)]
        np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(want),
                                   rtol=2e-6, atol=1e-5, err_msg=str(spec))
