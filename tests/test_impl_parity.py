"""Full sparse-phase implementation parity: the pallas path (block-grad
kernel + fused Adam, interpret mode on CPU) must track the XLA oracle."""
import jax
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, make_batches, smt_cfg


def test_pallas_path_matches_oracle_e2e():
    losses = {}
    states = {}
    for impl in ("oracle", "pallas"):
        cfg = smt_cfg(sparse_impl=impl)
        t = SMTTrainer(cfg, CFG, init_params(jax.random.PRNGKey(0), CFG),
                       total_steps=6)
        losses[impl] = [float(t.train_step(b)["loss"]) for b in make_batches(6)]
        states[impl] = t.state

    np.testing.assert_allclose(losses["oracle"], losses["pallas"], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(states["oracle"]),
                    jax.tree.leaves(states["pallas"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
