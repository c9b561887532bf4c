"""Throughput/FLOPs reporter + saliency histogram artifact."""
import os

import numpy as np

from sparse_matrix_tuning_tpu.utils.throughput import (
    ThroughputReporter, calculate_flops,
)
from sparse_matrix_tuning_tpu.utils.analysis import analyze_gradient_distribution


def test_megatron_flops_formula():
    # 24 * ckpt * B * s * L * h^2 * (1 + s/6h + V/16Lh)
    # (reference deepspeed_helpers.py:502-510)
    got = calculate_flops(4, 2, 128, 4, 256, 1000)
    expect = (24 * 4 * 2 * 128 * 4 * 256 ** 2) * (
        1 + 128 / (6 * 256) + 1000 / (16 * 4 * 256))
    assert got == expect


def test_throughput_reporter_cadence():
    rep = ThroughputReporter(batch_size=4, seq_length=128, num_layers=2,
                             hidden_size=256, vocab_size=1000,
                             num_devices=2, every=10)
    assert rep.maybe_report(0) is None  # starts the clock
    for step in range(1, 10):
        assert rep.maybe_report(step) is None
    out = rep.maybe_report(10)
    assert out is not None
    assert out["tokens_per_sec_per_chip"] > 0
    assert out["tflops_per_chip"] > 0
    assert rep.maybe_report(11) is None  # window reset


def test_gradient_histogram_artifact(tmp_path):
    stats = {
        ("q_proj", 0): np.random.default_rng(0).random((4, 4)),
        ("q_proj", 1): np.random.default_rng(1).random((4, 4)),
        ("gate_proj", 0): np.random.default_rng(2).random((8, 4)),
    }
    path = analyze_gradient_distribution(stats, str(tmp_path))
    assert os.path.exists(path)
    assert "q_proj" in path and "gate_proj" in path
    assert os.path.getsize(path) > 1000
