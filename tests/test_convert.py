"""Conversion-event unit tests — especially quirk P2: attention selection
always scores with mean_abs (the reference omits calculate_strategy for the
attention call, fine_tune.py:306-313), while MLP uses the configured one."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.train.convert import (
    compute_channel_selection, compute_matrix_selection,
)

B = 256


def cfg_with(**kw):
    base = dict(data_path=["x"], model_name_or_path="m",
                matrix_sparsity=True, full_ft_steps=1)
    base.update(kw)
    return SMTConfig(**base)


def test_attention_uses_mean_abs_even_when_strategy_is_abs_mean():
    # one attention tensor, two blocks:
    #   block A: +1/-1 alternating -> mean_abs ~ 0, abs_mean = 1
    #   block B: all 0.5           -> mean_abs = 0.5, abs_mean = 0.5
    g = np.zeros((B, 2 * B), np.float32)
    g[:, :B] = 1.0
    g[: B // 2, :B] = -1.0      # block (0,0): A
    g[:, B:] = 0.5              # block (0,1): B
    acc = {"0.q_proj": jnp.asarray(g)}

    # denominator chosen so exactly 1 attention block is selected
    shapes = [(B, 2 * B)] * 50  # 100 blocks total
    cfg = cfg_with(calculate_strategy="abs_mean",
                   downsample_attention_blocks_ratio=0.01,
                   downsample_mlp_blocks_ratio=-1.0)
    sel = compute_matrix_selection(cfg, acc, shapes)
    # under abs_mean block A would win; under mean_abs (the quirk) block B wins
    assert sel == {("q_proj", 0): [(0, 1)]}


def test_mlp_uses_configured_strategy():
    g = np.zeros((B, 2 * B), np.float32)
    g[:, :B] = 1.0
    g[: B // 2, :B] = -1.0
    g[:, B:] = 0.5
    acc = {"0.gate_proj": jnp.asarray(g)}
    shapes = [(B, 2 * B)] * 50
    cfg = cfg_with(calculate_strategy="abs_mean",
                   downsample_attention_blocks_ratio=-1.0,
                   downsample_mlp_blocks_ratio=0.01)
    sel = compute_matrix_selection(cfg, acc, shapes)
    # abs_mean: block A (value 1.0) beats block B (0.5)
    assert sel == {("gate_proj", 0): [(0, 0)]}


def test_channel_attention_quirk():
    # column 0: +1/-1 over seq -> mean_abs(|acc|)... channel stats work on
    # the accumulated SUM of |x| (non-negative), so craft via magnitudes:
    # col 0 large on half the rows, col 1 medium everywhere
    act = np.zeros((8, 2), np.float32)
    act[:4, 0] = 2.0          # mean over dim0 = 1.0
    act[:, 1] = 0.9           # mean = 0.9
    acc = {"0.q_proj": jnp.asarray(act), "0.gate_proj": jnp.asarray(act)}
    cfg = cfg_with(matrix_sparsity=False, channel_sparsity=True,
                   calculate_strategy="L2",
                   num_attention_channel=1, num_mlp_channel=1)
    sel = compute_channel_selection(cfg, acc)
    # attention: mean_abs -> col 0 (1.0 > 0.9)
    assert sel[("q_proj", 0)] == [0]
    # mlp: L2 -> col0 = sqrt(4*4)=4? vs col1 = sqrt(8*0.81)=2.54 -> col 0 too;
    # flip so L2 prefers col 1: need col1 larger in L2 but smaller in mean
    act2 = np.zeros((8, 2), np.float32)
    act2[0, 0] = 8.0          # mean 1.0, L2 8.0
    act2[:, 1] = 1.1          # mean 1.1, L2 3.11
    acc2 = {"0.q_proj": jnp.asarray(act2), "0.gate_proj": jnp.asarray(act2)}
    sel2 = compute_channel_selection(cfg, acc2)
    assert sel2[("q_proj", 0)] == [1]     # mean_abs: 1.1 > 1.0
    assert sel2[("gate_proj", 0)] == [0]  # L2: 8.0 > 3.11


def test_empty_selection_raises_via_convert():
    from sparse_matrix_tuning_tpu.train import convert as convert_mod
    from sparse_matrix_tuning_tpu.train.steps import init_warmup_state
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
    import jax
    cfg = cfg_with(downsample_attention_blocks_ratio=1e-9,
                   downsample_mlp_blocks_ratio=1e-9)
    params = init_params(jax.random.PRNGKey(0), LlamaConfig.tiny())
    state = init_warmup_state(params, cfg)
    with pytest.raises(ValueError, match="zero trainable"):
        convert_mod.convert(cfg, state, [(512, 512)])
