"""Orbax checkpoint/resume: a capability the reference lacks (SURVEY.md
§5.4). Resume mid-warm-up must preserve saliency accumulators (identical
selection); resume mid-sparse-phase must continue bit-identically."""
import jax
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, make_batches, smt_cfg


def fresh_trainer(cfg, total=8, seed=0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    return SMTTrainer(cfg, CFG, params, total_steps=total)


def test_resume_mid_warmup_preserves_selection(tmp_path):
    cfg = smt_cfg(full_ft_steps=3)
    batches = make_batches(6)

    # uninterrupted run
    t_ref = fresh_trainer(cfg)
    for b in batches:
        t_ref.train_step(b)

    # interrupted at step 2 (mid warm-up, accumulators half-filled)
    t_a = fresh_trainer(cfg)
    for b in batches[:2]:
        t_a.train_step(b)
    save_checkpoint(str(tmp_path / "ck"), t_a)

    t_b = fresh_trainer(cfg)
    restore_checkpoint(str(tmp_path / "ck"), t_b)
    assert t_b.step == 2 and t_b.phase == "warmup"
    losses = [float(t_b.train_step(b)["loss"]) for b in batches[2:]]
    assert np.isfinite(losses).all()

    assert t_b.plan.fingerprint() == t_ref.plan.fingerprint()
    # states must match the uninterrupted run exactly
    for a, b in zip(jax.tree.leaves(t_ref.state), jax.tree.leaves(t_b.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_mid_sparse_phase(tmp_path):
    cfg = smt_cfg(full_ft_steps=2)
    batches = make_batches(7)

    t_ref = fresh_trainer(cfg)
    for b in batches:
        t_ref.train_step(b)

    t_a = fresh_trainer(cfg)
    for b in batches[:4]:  # 2 warm-up + conversion + 2 sparse
        t_a.train_step(b)
    assert t_a.phase == "sparse"
    save_checkpoint(str(tmp_path / "ck"), t_a)

    t_b = fresh_trainer(cfg)
    restore_checkpoint(str(tmp_path / "ck"), t_b)
    assert t_b.phase == "sparse" and t_b.step == 4
    assert t_b.plan.fingerprint() == t_a.plan.fingerprint()
    for b in batches[4:]:
        t_b.train_step(b)

    for a, b in zip(jax.tree.leaves(t_ref.state), jax.tree.leaves(t_b.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
