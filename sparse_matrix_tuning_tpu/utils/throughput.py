"""Throughput / FLOPs / HBM reporting.

Reference print_throughput + calculate_flops (deepspeed_helpers.py:470-525)
uses the Megatron-LM formula; we keep that formula for comparability and add
the TPU-native measurements the reference lacks: tokens/sec/chip (the
BASELINE.json metric) and per-device HBM via device.memory_stats().
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional


def calculate_flops(checkpoint_activations_factor: int, batch_size: int,
                    seq_length: int, num_layers: int, hidden_size: int,
                    vocab_size: int) -> float:
    """Megatron-LM GPT FLOPs per iteration
    (reference deepspeed_helpers.py:502-510):
    24 * ckpt_factor * B * s * L * h^2 * (1 + s/6h + V/16Lh)."""
    return (24 * checkpoint_activations_factor * batch_size * seq_length *
            num_layers * (hidden_size ** 2)) * (
        1.0 + (seq_length / (6.0 * hidden_size)) +
        (vocab_size / (16.0 * num_layers * hidden_size)))


# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 matmul,
# 394 TOP/s int8, ~819 GB/s HBM bandwidth. Used to normalise measured
# throughput to hardware-ceiling utilisation (MFU) in bench.py — the
# reference prints raw TFLOPs only (print_throughput,
# deepspeed_helpers.py:470-496).
V5E_BF16_PEAK_FLOPS = 197e12
V5E_INT8_PEAK_FLOPS = 394e12
V5E_HBM_GBPS = 819.0


def llama_step_flops(model_cfg, bsz: int, seq: int, *, body_units: float,
                     attn_units: float, head_units: float) -> float:
    """Executed matmul FLOPs of ONE train/eval step at this geometry,
    from the ACTUAL Llama shapes (GQA + SwiGLU) rather than the Megatron
    GPT formula (calculate_flops above, kept for reference comparability).

    Per-token forward matmul FLOPs:
      body  = 2 * (per-layer linear params) * L     (q/k/v/o/gate/up/down)
      attn  = 4 * seq * (hq*hd) * L                 (QK^T + PV, full causal
                                                     square as executed)
      head  = 2 * V * h                             (lm-head logits)

    The *_units factors state how many forward-equivalents of each part a
    step executes: fwd=1; +grad_input=+1; +grad_weight=+1 (attention's
    backward is ~2 fwd-units: 4 matmuls vs 2); +remat recompute=+1;
    chunked-loss backward recomputes chunk logits = +0.5 head units.
    SMT's selected-block grad_weight is < 1% of a unit and is ignored.
    """
    h = model_cfg.hidden_size
    f = model_cfg.intermediate_size
    hd = model_cfg.head_dim
    att = model_cfg.num_attention_heads * hd
    kv = model_cfg.num_key_value_heads * hd
    L = model_cfg.num_hidden_layers
    tokens = bsz * seq
    per_layer_w = h * att + 2 * h * kv + att * h + 3 * h * f
    body = 2.0 * per_layer_w * L * tokens
    attn = 4.0 * seq * att * L * tokens
    head = 2.0 * model_cfg.vocab_size * h * tokens
    return body * body_units + attn * attn_units + head * head_units


def hbm_stats(device=None) -> dict:
    """Per-device HBM accounting (replaces pytorch_memlab MemReporter,
    reference smt.py:861-862)."""
    import jax
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def live_hbm_bytes() -> int:
    """Sum of live array bytes (fallback when memory_stats is unavailable)."""
    import jax
    return sum(a.nbytes for a in jax.live_arrays())


@dataclass
class ThroughputReporter:
    """Rank-0, every-N-steps throughput print (reference print_throughput,
    cadence fine_tune.py:779-783)."""
    batch_size: int
    seq_length: int
    num_layers: int
    hidden_size: int
    vocab_size: int
    num_devices: int = 1
    checkpoint_activations_factor: int = 4
    every: int = 200
    _t0: Optional[float] = field(default=None, repr=False)
    _step0: int = 0

    def start(self, step: int = 0):
        self._t0 = time.time()
        self._step0 = step

    def maybe_report(self, step: int) -> Optional[dict]:
        if self._t0 is None:
            self.start(step)
            return None
        if step == self._step0 or (step - self._step0) % self.every:
            return None
        elapsed = time.time() - self._t0
        iters = step - self._step0
        sec_per_iter = elapsed / iters
        flops = calculate_flops(self.checkpoint_activations_factor,
                                self.batch_size, self.seq_length,
                                self.num_layers, self.hidden_size,
                                self.vocab_size)
        tokens = self.batch_size * self.seq_length
        report = {
            "step": step,
            "sec_per_iter": sec_per_iter,
            "samples_per_sec": self.batch_size / sec_per_iter,
            "tokens_per_sec_per_chip": tokens / sec_per_iter / max(self.num_devices, 1),
            "tflops_per_chip": flops / sec_per_iter / max(self.num_devices, 1) / 1e12,
        }
        self._t0 = time.time()
        self._step0 = step
        return report
