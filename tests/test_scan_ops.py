"""Dynamic-index (scan-over-layers) sparse linear: parity with the static
custom_vjp paths, padded-entry masking, bf16 and q8 frozen bases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight, quantize_weight
from sparse_matrix_tuning_tpu.ops.sparse_linear import (
    smt_linear, smt_linear_dyn, smt_linear_q8,
)
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan


def _setup(seed=0, out_dim=512, in_dim=512, n=2):
    rng = np.random.default_rng(seed)
    w0 = jnp.asarray(rng.standard_normal((out_dim, in_dim)) * 0.05, jnp.float32)
    blocks_coords = ((0, 1), (1, 0))[:n]
    lp = LinearPlan("q_proj", 0, out_dim, in_dim, blocks=blocks_coords)
    w04 = np.asarray(w0).reshape(out_dim // BLOCK, BLOCK, in_dim // BLOCK, BLOCK)
    base = jnp.asarray(np.stack([w04[r, :, c, :] for r, c in blocks_coords]))
    blocks = base + jnp.asarray(
        rng.standard_normal(base.shape) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, in_dim)), jnp.float32)
    g_w = jnp.asarray(rng.standard_normal((8, out_dim)), jnp.float32)
    rb = jnp.asarray([r for r, _ in blocks_coords], jnp.int32)
    cb = jnp.asarray([c for _, c in blocks_coords], jnp.int32)
    return lp, w0, base, blocks, x, g_w, rb, cb


def _scattered(w0, blocks, lp):
    w4 = np.asarray(w0).reshape(lp.out_dim // BLOCK, BLOCK,
                                lp.in_dim // BLOCK, BLOCK).copy()
    for j, (r, c) in enumerate(lp.blocks):
        w4[r, :, c, :] = np.asarray(blocks)[j]
    return jnp.asarray(w4.reshape(lp.out_dim, lp.in_dim))


def test_dyn_bf16_matches_static_forward_and_grads():
    lp, w0, base, blocks, x, g_w, rb, cb = _setup()
    valid = jnp.ones((2,), bool)
    w_cur = _scattered(w0, blocks, lp)  # static path: blocks live in w

    def loss_dyn(blocks):
        y = smt_linear_dyn("oracle", x, blocks, rb, cb, valid,
                           {"w": w0}, base)
        return jnp.sum(y * g_w), y

    def loss_static(blocks):
        y = smt_linear(x, blocks, w_cur, lp, impl="oracle")
        return jnp.sum(y * g_w), y

    (_, y_d), g_d = jax.value_and_grad(loss_dyn, has_aux=True)(blocks)
    (_, y_s), g_s = jax.value_and_grad(loss_static, has_aux=True)(blocks)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_s),
                               rtol=1e-5, atol=1e-5)

    # grad_x parity
    def lx_dyn(x):
        return jnp.sum(smt_linear_dyn("oracle", x, blocks, rb, cb, valid,
                                      {"w": w0}, base) * g_w)
    def lx_static(x):
        return jnp.sum(smt_linear(x, blocks, w_cur, lp, impl="oracle") * g_w)
    np.testing.assert_allclose(np.asarray(jax.grad(lx_dyn)(x)),
                               np.asarray(jax.grad(lx_static)(x)),
                               rtol=1e-5, atol=1e-5)


def test_dyn_q8_matches_static_q8():
    lp, w0, base_bf, blocks, x, g_w, rb, cb = _setup()
    valid = jnp.ones((2,), bool)
    wq, sw = quantize_weight(w0)
    # q8 base blocks = dequantized frozen values at the block coords
    wd4 = np.asarray(dequantize_weight(wq, sw, jnp.float32)).reshape(
        lp.out_dim // BLOCK, BLOCK, lp.in_dim // BLOCK, BLOCK)
    base = jnp.asarray(np.stack([wd4[r, :, c, :] for r, c in lp.blocks]))

    def loss_dyn(blocks):
        y = smt_linear_dyn("oracle", x, blocks, rb, cb, valid,
                           {"wq": wq, "sw": sw}, base)
        return jnp.sum(y * g_w), y

    def loss_static(blocks):
        y = smt_linear_q8(x, blocks, wq, sw, base, lp, impl="oracle")
        return jnp.sum(y * g_w), y

    (_, y_d), g_d = jax.value_and_grad(loss_dyn, has_aux=True)(blocks)
    (_, y_s), g_s = jax.value_and_grad(loss_static, has_aux=True)(blocks)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_s),
                               rtol=2e-5, atol=2e-5)


def test_dyn_padded_entries_are_inert():
    """A padded duplicate entry (valid=False) must not change y and must get
    zero block-grad."""
    lp, w0, base, blocks, x, g_w, rb, cb = _setup()
    # pad to n=3 with a duplicate of entry 0
    rb3 = jnp.concatenate([rb, rb[:1]])
    cb3 = jnp.concatenate([cb, cb[:1]])
    valid3 = jnp.asarray([True, True, False])
    blocks3 = jnp.concatenate([blocks, blocks[:1] + 123.0])  # junk value
    base3 = jnp.concatenate([base, base[:1]])

    def loss3(blocks3):
        y = smt_linear_dyn("oracle", x, blocks3, rb3, cb3, valid3,
                           {"w": w0}, base3)
        return jnp.sum(y * g_w), y

    def loss2(blocks):
        y = smt_linear_dyn("oracle", x, blocks, rb, cb,
                           jnp.ones((2,), bool), {"w": w0}, base)
        return jnp.sum(y * g_w), y

    (_, y3), g3 = jax.value_and_grad(loss3, has_aux=True)(blocks3)
    (_, y2), g2 = jax.value_and_grad(loss2, has_aux=True)(blocks)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g3[:2]), np.asarray(g2), rtol=1e-6)
    assert np.all(np.asarray(g3[2]) == 0.0)


def test_dyn_pallas_correction_matches_oracle():
    """impl="pallas" routes the traced-coordinate corrections through the
    fused Pallas epilogue kernel (ops/pallas/correction.py, interpret mode
    off-TPU): forward, grad_blocks and grad_x must match the sequential
    oracle chain. Duplicate out-blocks exercise the VMEM-resident run."""
    lp, w0, base, blocks, x, g_w, rb, cb = _setup()
    # duplicate-row plan: both blocks write row-block 0
    rb = jnp.asarray([0, 0], jnp.int32)
    cb = jnp.asarray([1, 0], jnp.int32)
    valid = jnp.ones((2,), bool)

    def run(impl):
        def loss(blocks, x):
            y = smt_linear_dyn(impl, x, blocks, rb, cb, valid,
                               {"w": w0}, base)
            return jnp.sum(y * g_w), y
        (_, y), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(blocks, x)
        return np.asarray(y), np.asarray(grads[0]), np.asarray(grads[1])

    y_o, gb_o, gx_o = run("oracle")
    y_p, gb_p, gx_p = run("pallas")
    np.testing.assert_allclose(y_p, y_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gb_p, gb_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gx_p, gx_o, rtol=1e-5, atol=1e-5)
