"""fit()-level resume: interrupt a 2-epoch run after epoch 1, restore from
the orbax checkpoint, fit() again — final state must match the
uninterrupted run exactly (deterministic batch order replay)."""
import jax
import numpy as np

from sparse_matrix_tuning_tpu.data.sft import SFTDataset
from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.checkpoint import restore_checkpoint
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, smt_cfg


def make_ds(n=8, seq=16):
    rng = np.random.default_rng(0)
    ids = [rng.integers(3, 256, seq).astype(np.int32) for _ in range(n)]
    return SFTDataset(ids, [i.copy() for i in ids])


def test_fit_resume_matches_uninterrupted(tmp_path):
    ds = make_ds()
    common = dict(num_ft_epochs=2, per_device_ft_batch_size=2,
                  save_steps=0, eval_step=0)

    # uninterrupted 2-epoch run
    cfg_a = smt_cfg(output_dir=str(tmp_path / "a"), **common)
    t_a = SMTTrainer(cfg_a, CFG, init_params(jax.random.PRNGKey(0), CFG),
                     total_steps=8)
    t_a.fit(ds, ds.subset([0]), pad_token_id=0)

    # interrupted: 1 epoch only, checkpoint written at epoch end
    cfg_b1 = smt_cfg(output_dir=str(tmp_path / "b"), **{**common, "num_ft_epochs": 1})
    t_b1 = SMTTrainer(cfg_b1, CFG, init_params(jax.random.PRNGKey(0), CFG),
                      total_steps=8)
    t_b1.fit(ds, ds.subset([0]), pad_token_id=0)
    assert t_b1.step == 4

    # resume into a 2-epoch config
    cfg_b2 = smt_cfg(output_dir=str(tmp_path / "b2"), **common)
    t_b2 = SMTTrainer(cfg_b2, CFG, init_params(jax.random.PRNGKey(0), CFG),
                      total_steps=8)
    restore_checkpoint(str(tmp_path / "b" / "ckpt"), t_b2)
    assert t_b2.step == 4
    t_b2.fit(ds, ds.subset([0]), pad_token_id=0)
    assert t_b2.step == 8

    for a, b in zip(jax.tree.leaves(t_a.state), jax.tree.leaves(t_b2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
