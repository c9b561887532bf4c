"""Small unit coverage: config serialization, mesh spec fitting, HBM stats."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sparse_matrix_tuning_tpu.config import SMTConfig, parse_args
from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh, state_shardings
from sparse_matrix_tuning_tpu.utils.throughput import hbm_stats, live_hbm_bytes


def test_config_json_roundtrip():
    cfg = SMTConfig(data_path=["a.json"], model_name_or_path="m",
                    matrix_sparsity=True, full_ft_steps=7, smt_lr=3e-4)
    cfg2 = SMTConfig.from_json(cfg.to_json())
    assert cfg2.full_ft_steps == 7 and cfg2.smt_lr == 3e-4
    assert cfg2.data_path == ["a.json"]
    assert cfg2.seq_buckets == cfg.seq_buckets


def test_config_rejects_bad_values():
    with pytest.raises(ValueError, match="selection_strategy"):
        SMTConfig(data_path=["x"], selection_strategy="bogus")
    with pytest.raises(ValueError, match="mutually exclusive"):
        SMTConfig(data_path=["x"], matrix_sparsity=True, channel_sparsity=True)
    with pytest.raises(ValueError, match="saliency_accumulation"):
        SMTConfig(data_path=["x"], saliency_accumulation="bogus")


def test_parse_args_bool_flags():
    cfg = parse_args(["--data_path", "x", "--model_name_or_path", "m",
                      "--matrix_sparsity", "--qk_scheduler",
                      "--no_gradient_checkpointing"])
    assert cfg.matrix_sparsity and cfg.qk_scheduler
    assert not cfg.gradient_checkpointing
    assert cfg.compute_fp32_loss  # store_true default must not clobber True


def test_mesh_fit_drops_non_divisible_axes():
    mesh = make_mesh((1, 8, 1))
    # a (1, 256, 256) trainable: dim0=1 not divisible by fsdp=8 in matrix
    # mode spec P(None, 'fsdp', None) -> dim1=256 divisible -> kept
    state = {"trainable": {"k": np.zeros((1, 256, 256), np.float32)},
             "m": {"k": np.zeros((1, 256, 256), np.float32)},
             "v": {"k": np.zeros((1, 256, 256), np.float32)},
             "count": np.zeros((), np.int32),
             "step": np.zeros((), np.int32),
             "params": {"norm": np.zeros((16,), np.float32), "layers": {}}}
    sh = state_shardings(state, mesh, plan_mode="matrix")
    assert sh["trainable"]["k"].spec == P(None, "fsdp", None)
    # odd-length 1-D param stays replicated
    assert sh["params"]["norm"].spec == P()


def test_hbm_stats_shape():
    s = hbm_stats()
    assert {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"} <= set(s)
    assert live_hbm_bytes() >= 0
