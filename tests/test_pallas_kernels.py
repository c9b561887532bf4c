"""Pallas kernels vs XLA oracle (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.pallas.block_grad import block_grad_weight
from sparse_matrix_tuning_tpu.ops.sparse_linear import _block_grad_weight_xla
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan


@pytest.mark.parametrize("t", [512, 700])  # aligned and ragged T
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_block_grad_weight_matches_oracle(t, dtype):
    rng = np.random.default_rng(0)
    out_dim, in_dim = 3 * BLOCK, 2 * BLOCK
    blocks = ((0, 1), (2, 0), (1, 1))
    lp = LinearPlan("q_proj", 0, out_dim, in_dim, blocks=blocks)

    g2 = jnp.asarray(rng.standard_normal((t, out_dim)), dtype)
    x2 = jnp.asarray(rng.standard_normal((t, in_dim)), dtype)

    got = block_grad_weight(g2, x2, lp.row_blocks(), lp.col_blocks())
    want = _block_grad_weight_xla(lp, g2, x2)

    assert got.shape == (3, BLOCK, BLOCK)
    assert got.dtype == jnp.float32
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol * 10)


def test_repeated_block_coords():
    # two selected blocks may share a row- or col-block; kernel must not care
    rng = np.random.default_rng(1)
    g2 = jnp.asarray(rng.standard_normal((512, 2 * BLOCK)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((512, 2 * BLOCK)), jnp.float32)
    lp = LinearPlan("q_proj", 0, 2 * BLOCK, 2 * BLOCK,
                    blocks=((0, 0), (0, 1), (1, 0)))
    got = block_grad_weight(g2, x2, lp.row_blocks(), lp.col_blocks())
    want = _block_grad_weight_xla(lp, g2, x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)
