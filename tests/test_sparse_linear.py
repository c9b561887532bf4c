"""custom_vjp sparse linear vs a dense+mask oracle.

The property checked is the reference's test_partial_backward
(smt.py:907-945): the frozen dense weight receives no gradient, the
selected blocks/channels receive exactly the gradient a dense layer would
give them, and unselected regions receive none.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.sparse_linear import smt_linear, smt_channel_linear
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan, SMTPlan

OUT, IN = 2 * BLOCK, 3 * BLOCK


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup_matrix(rng, blocks=((0, 1), (1, 2))):
    lp = LinearPlan("q_proj", 0, OUT, IN, blocks=blocks)
    w = rng.standard_normal((OUT, IN)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 5, IN)).astype(np.float32)
    sel = np.stack([w[rb * BLOCK:(rb + 1) * BLOCK, cb * BLOCK:(cb + 1) * BLOCK]
                    for rb, cb in blocks])
    return lp, jnp.array(w), jnp.array(x), jnp.array(sel)


def test_forward_matches_dense(rng):
    lp, w, x, sel = _setup_matrix(rng)
    y = smt_linear(x, sel, w, lp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ np.asarray(w).T,
                               rtol=1e-5, atol=1e-5)


def test_block_grads_match_dense_oracle(rng):
    lp, w, x, sel = _setup_matrix(rng)

    def sparse_loss(blocks, xx):
        return jnp.sum(smt_linear(xx, blocks, w, lp) ** 2)

    def dense_loss(ww, xx):
        return jnp.sum(jnp.einsum("...i,oi->...o", xx, ww) ** 2)

    g_blocks, g_x = jax.grad(sparse_loss, argnums=(0, 1))(sel, x)
    g_w_dense, g_x_dense = jax.grad(dense_loss, argnums=(0, 1))(w, x)

    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_x_dense), rtol=1e-4, atol=1e-4)
    for i, (rb, cb) in enumerate(lp.blocks):
        expect = np.asarray(g_w_dense)[rb * BLOCK:(rb + 1) * BLOCK, cb * BLOCK:(cb + 1) * BLOCK]
        np.testing.assert_allclose(np.asarray(g_blocks)[i], expect, rtol=1e-4, atol=1e-4)


def test_frozen_dense_weight_gets_zero_grad(rng):
    lp, w, x, sel = _setup_matrix(rng)

    def loss_wrt_w(ww):
        return jnp.sum(smt_linear(x, sel, ww, lp))

    g_w = jax.grad(loss_wrt_w)(w)
    np.testing.assert_array_equal(np.asarray(g_w), 0.0)


def test_channel_grads_match_dense_oracle(rng):
    channels = (0, 7, 300)
    lp = LinearPlan("up_proj", 1, OUT, IN, channels=channels)
    w = jnp.array(rng.standard_normal((OUT, IN)).astype(np.float32) * 0.1)
    x = jnp.array(rng.standard_normal((2, 5, IN)).astype(np.float32))
    cols = w[:, np.array(channels)]

    def sparse_loss(cc, xx):
        return jnp.sum(smt_channel_linear(xx, cc, w, lp) ** 2)

    def dense_loss(ww, xx):
        return jnp.sum(jnp.einsum("...i,oi->...o", xx, ww) ** 2)

    g_cols, g_x = jax.grad(sparse_loss, argnums=(0, 1))(cols, x)
    g_w_dense, g_x_dense = jax.grad(dense_loss, argnums=(0, 1))(w, x)

    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_x_dense), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_cols),
                               np.asarray(g_w_dense)[:, np.array(channels)],
                               rtol=1e-4, atol=1e-4)


def test_plan_gather_scatter_roundtrip(rng):
    blocks = ((1, 0), (0, 2))
    lp = LinearPlan("gate_proj", 0, OUT, IN, blocks=blocks)
    plan = SMTPlan(mode="matrix", linears={"0.gate_proj": lp})
    w = jnp.array(rng.standard_normal((OUT, IN)).astype(np.float32))
    layers = {"0": {"gate_proj": w}}

    gathered = plan.gather(layers)
    assert gathered["0.gate_proj"].shape == (2, BLOCK, BLOCK)
    for i, (rb, cb) in enumerate(blocks):
        np.testing.assert_array_equal(
            np.asarray(gathered["0.gate_proj"][i]),
            np.asarray(w)[rb * BLOCK:(rb + 1) * BLOCK, cb * BLOCK:(cb + 1) * BLOCK])

    updated = {k: v + 1.0 for k, v in gathered.items()}
    new_layers = plan.scatter(layers, updated)
    nw = np.asarray(new_layers["0"]["gate_proj"])
    ow = np.asarray(w)
    mask = np.zeros_like(ow, dtype=bool)
    for rb, cb in blocks:
        mask[rb * BLOCK:(rb + 1) * BLOCK, cb * BLOCK:(cb + 1) * BLOCK] = True
    np.testing.assert_allclose(nw[mask], ow[mask] + 1.0, rtol=1e-6)
    np.testing.assert_array_equal(nw[~mask], ow[~mask])


def test_plan_json_roundtrip():
    lp = LinearPlan("q_proj", 3, OUT, IN, blocks=((0, 0), (1, 2)))
    plan = SMTPlan(mode="matrix", linears={"3.q_proj": lp})
    plan2 = SMTPlan.from_json(plan.to_json())
    assert plan2.mode == "matrix"
    assert plan2.linears["3.q_proj"] == lp
    assert plan2.fingerprint() == plan.fingerprint()


def test_trainable_param_count():
    lp = LinearPlan("q_proj", 0, OUT, IN, blocks=((0, 0),))
    lpc = LinearPlan("up_proj", 0, OUT, IN, channels=(1, 2))
    assert lp.trainable_params == BLOCK * BLOCK
    assert lpc.trainable_params == 2 * OUT
