"""Gradient accumulation: A microbatches must equal one big batch exactly
(fp32), in both phases."""
import jax
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, make_batches, smt_cfg


def losses_with(accum, batches, n_steps=5):
    cfg = smt_cfg(gradient_accumulation_steps=accum)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=n_steps)
    out = [float(trainer.train_step(b)["loss"]) for b in batches]
    return trainer, out


def test_accumulation_matches_big_batch():
    batches = make_batches(5, bsz=8)  # 8 = 4 micro x 2? use accum=4 -> micro 2
    t1, l1 = losses_with(1, batches)
    t4, l4 = losses_with(4, batches)
    np.testing.assert_allclose(l1, l4, rtol=2e-5, atol=1e-6)
    assert t1.plan.fingerprint() == t4.plan.fingerprint()
    # state matches up to fp32 reduction-order noise amplified through
    # Adam's rsqrt over 5 steps (losses above assert the tight agreement)
    for a, b in zip(jax.tree.leaves(t1.state), jax.tree.leaves(t4.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
