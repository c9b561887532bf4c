"""Trainer observability/guards: NaN abort, metrics.jsonl stream."""
import json

import jax
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer
from sparse_matrix_tuning_tpu.data.sft import SFTDataset

from test_train_e2e import CFG, smt_cfg


def make_ds(n=8, seq=12):
    rng = np.random.default_rng(0)
    ids = [rng.integers(3, 256, seq).astype(np.int32) for _ in range(n)]
    return SFTDataset(ids, [i.copy() for i in ids])


def test_metrics_jsonl_written(tmp_path):
    cfg = smt_cfg(output_dir=str(tmp_path), num_ft_epochs=1,
                  per_device_ft_batch_size=2, save_steps=0)
    trainer = SMTTrainer(cfg, CFG, init_params(jax.random.PRNGKey(0), CFG),
                         total_steps=4)
    ds = make_ds()
    trainer.fit(ds, ds.subset([0]), pad_token_id=0)
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 4
    assert {"step", "phase", "loss"} <= set(recs[0])
    assert recs[-1]["phase"] == "sparse"


def test_nan_guard_aborts(tmp_path):
    cfg = smt_cfg(output_dir=str(tmp_path), num_ft_epochs=1,
                  per_device_ft_batch_size=2, save_steps=0,
                  ft_learning_rate=1e12)  # guaranteed blow-up
    trainer = SMTTrainer(cfg, CFG, init_params(jax.random.PRNGKey(0), CFG),
                         total_steps=4)
    ds = make_ds()
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.fit(ds, ds.subset([0]), pad_token_id=0)
