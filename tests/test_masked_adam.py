"""Fused Pallas block-Adam vs the functional adam_step reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.pallas.masked_adam import fused_block_adam
from sparse_matrix_tuning_tpu.smt.optimizer import AdamConfig, adam_init, adam_step


@pytest.mark.parametrize("wd", [0.0, 0.1])
def test_fused_matches_functional(wd):
    rng = np.random.default_rng(0)
    n = 3
    p = jnp.asarray(rng.standard_normal((n, 256, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, 256, 256)) * 0.1, jnp.float32)
    cfg = AdamConfig(betas=(0.9, 0.95), eps=1e-8, weight_decay=wd)

    tree_p = {"t": p}
    opt = adam_init(tree_p)
    want_p, want_opt = adam_step({"t": g}, opt, tree_p, jnp.asarray(0.01), cfg)

    b1, b2 = cfg.betas
    scalars = jnp.asarray([0.01, b1, b2, cfg.eps, wd,
                           1 - b1 ** 1, 1 - b2 ** 1], jnp.float32)
    got_p, got_m, got_v = fused_block_adam(
        jnp.copy(p), g, jnp.zeros_like(p), jnp.zeros_like(p), scalars)

    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p["t"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_opt["m"]["t"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_opt["v"]["t"]),
                               rtol=1e-6, atol=1e-7)


def test_second_step_bias_correction():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((1, 256, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 256, 256)), jnp.float32)
    cfg = AdamConfig(betas=(0.9, 0.95))

    tree_p = {"t": p}
    opt = adam_init(tree_p)
    p1, opt = adam_step({"t": g}, opt, tree_p, jnp.asarray(0.1), cfg)
    p2, opt = adam_step({"t": g * 0.5}, opt, p1, jnp.asarray(0.1), cfg)

    b1, b2 = cfg.betas
    fp, fm, fv = jnp.copy(p), jnp.zeros_like(p), jnp.zeros_like(p)
    for step, gg in ((1, g), (2, g * 0.5)):
        scalars = jnp.asarray([0.1, b1, b2, cfg.eps, 0.0,
                               1 - b1 ** step, 1 - b2 ** step], jnp.float32)
        fp, fm, fv = fused_block_adam(fp, gg, fm, fv, scalars)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(p2["t"]),
                               rtol=1e-6, atol=1e-6)
