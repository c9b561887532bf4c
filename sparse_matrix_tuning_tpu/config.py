"""Typed configuration for SMT fine-tuning.

Mirrors the reference argparse surface (reference deepspeed/fine_tune.py:870-1078)
as a single frozen-ish dataclass plus a CLI parser, and adds the TPU-native
options (mesh layout, padding buckets, Pallas kernel toggle, orbax resume)
that replace the DeepSpeed config JSON (reference
deepspeed/helpers/deepspeed_helpers.py:37-146).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class SMTConfig:
    # --- data ---------------------------------------------------------------
    # reference: --data_path (append), --eval_set_ratio, --max_seq_len
    data_path: List[str] = field(default_factory=list)
    eval_set_ratio: float = 0.2
    max_seq_len: int = 2048
    # TPU-specific: pad each batch up to the next bucket boundary instead of
    # the reference's pad-to-longest (dynamic shapes would force an XLA
    # recompile per batch). `[max_seq_len]` = always pad fully.
    seq_buckets: Optional[List[int]] = None

    # --- model --------------------------------------------------------------
    model_name_or_path: str = ""
    dropout: float = 0.0           # reference: --dropout (configure_dropout)
    dtype: str = "bf16"            # reference: --dtype {fp16,bf16,fp32}
    compute_fp32_loss: bool = True  # loss/logits softmax in fp32
    gradient_checkpointing: bool = True  # reference: always enabled (fine_tune.py:192)
    # sparse-phase override: SMT frees grad+optimizer memory, which usually
    # buys remat-free sparse training. None = same as gradient_checkpointing.
    sparse_gradient_checkpointing: Optional[bool] = None

    # --- optimisation ---------------------------------------------------------
    per_device_ft_batch_size: int = 16
    per_device_eval_batch_size: int = 16
    ft_learning_rate: float = 9.65e-6
    smt_lr: float = 5e-5
    w_decay: float = 0.0
    num_ft_epochs: int = 3
    gradient_accumulation_steps: int = 1
    lr_scheduler_type: str = "linear"   # {linear, cosine, constant}
    lr_warmup_steps: int = 0
    smt_lr_warmup_steps: int = 0
    grad_clip: float = 1.0              # DS config gradient_clipping: 1.0
    # Adam betas: the reference hardcodes (0.9, 0.95) on the matrix path
    # (fine_tune.py:361-363) and (0.95, 0.999) on the channel path (:538-540).
    matrix_adam_betas: Sequence[float] = (0.9, 0.95)
    channel_adam_betas: Sequence[float] = (0.95, 0.999)
    warmup_adam_betas: Sequence[float] = (0.9, 0.95)
    adam_eps: float = 1e-8
    # fp16 dynamic loss scaling (reference inherits it from DeepSpeed's fp16
    # block, deepspeed_helpers.py:76-87; DS defaults: init 2^16, window
    # 2000, halve on overflow + skip step, double after `window` good steps)
    init_loss_scale: float = 2.0 ** 16
    loss_scale_window: int = 2000

    # --- SMT ------------------------------------------------------------------
    matrix_sparsity: bool = False
    channel_sparsity: bool = False
    full_ft_steps: int = 0              # warm-up steps before conversion; reference default inf
    downsample_attention_blocks_ratio: float = 0.0084
    downsample_mlp_blocks_ratio: float = -1.0
    num_mlp_channel: int = 30
    num_attention_channel: int = 30
    selection_strategy: str = "no_restriction"   # {no_restriction, norm_dist}
    calculate_strategy: str = "mean_abs"         # {mean_abs, abs_mean, L1, L2}
    no_limit_mixture: bool = False
    qk_scheduler: bool = False
    qk_lr_times: int = 2
    do_gradient_distribution_analysis: bool = False
    # warm-up saliency accumulation (matrix path):
    #   "grad_sum"       — reference-exact: accumulate the full fp32 grad sum
    #                      and reduce blocks once at conversion
    #                      (fine_tune.py:716-768 semantics); accumulator is
    #                      weight-sized fp32.
    #   "per_step_stats" — accumulate per-block reduced stats each step;
    #                      accumulator is (R/256, C/256) — ~65536x smaller.
    #                      For mean_abs (the default + the attention quirk)
    #                      the SIGNED block mean is accumulated and abs
    #                      applied at selection (select.block_stats_step/
    #                      _final), so the selection equals grad_sum's
    #                      EXACTLY; abs_mean/L1/L2 score sum_t stat(g_t)
    #                      instead of stat(sum_t g_t) (approximate).
    #   "auto"           — grad_sum while the accumulators fit (reference-
    #                      exact), per_step_stats at scale (resolved against
    #                      the actual model shapes in train/steps.py)
    saliency_accumulation: str = "auto"
    # TPU-specific: which sparse-linear implementation to use after conversion.
    #   "oracle"  — dense matmul fwd + block-masked custom_vjp (numerics oracle)
    #   "pallas"  — Pallas gather-matmul grad-weight kernel (performance path)
    #   "auto"    — pallas on TPU backends, oracle elsewhere
    sparse_impl: str = "auto"
    # attention implementation: "einsum" (reference-like masked softmax),
    # "flash" (fused Pallas kernel; TPU, right-padded causal only), "auto"
    attn_impl: str = "auto"
    # frozen-weight precision in the SPARSE phase (matrix mode):
    #   "none" — bf16 frozen weights, reference-equivalent numerics
    #   "int8" — frozen base quantized once to int8 (per-out-channel scales)
    #            with exact block corrections; ~1.7x matmul speedup on v5e
    #            at 8B widths (tools/int8_probe.py). Selected blocks see
    #            zero quantization error; export always merges into the
    #            exact bf16 dense weights. QLoRA-style precedent (PARITY.md
    #            D13).
    #   "auto" — int8 on TPU, none elsewhere
    frozen_quant: str = "auto"
    # int8 + single process/device: move the (compute-dead) bf16 dense
    # layer weights to host RAM for the sparse phase, freeing 2 bytes/param
    # of HBM; export/checkpoint reconstruct them (train/convert.py
    # frozen_offload_active). Eval-loss then runs the same q8-corrected
    # forward as training (without offload it reads the exact bf16 dense
    # weights).
    frozen_host_offload: bool = True
    # quantize the FROZEN lm-head matmul of the sparse-phase loss to int8
    # too ("auto": engages whenever frozen_quant resolves to int8). The
    # dense loss path runs the same custom_vjp as fully-frozen layer
    # linears (frozen_q8_linear); the chunked path runs the int8-per-chunk
    # online-LSE (ops/loss.py chunked_causal_lm_loss_q8). Saves ~11 ms/step
    # at bench geometry (head+loss f+b 30.8 -> 20.1 ms, V=32000).
    # Exports/eval-CLI generation still use the exact bf16 head.
    head_quant: str = "auto"
    # sparse-phase layer loop: "off" = unrolled (one program copy per
    # layer), "on" = ONE lax.scan over stacked layers (depth-independent
    # compile time; train/scan_phase.py), "auto" = scan for matrix-mode
    # models >= 12 layers
    scan_layers: str = "auto"
    # path to a plan.json from a previous warm-up+selection run: skip
    # warm-up entirely and quantize-on-load the base checkpoint straight
    # into the int8 scan sparse state (full-precision weights never
    # co-reside on device — 8B sparse-trains on one 16G chip)
    sparse_from_plan: Optional[str] = None
    # loss implementation: "full" (materialise (B,S,V) fp32 logits),
    # "chunked" (fused head+CE over vocab chunks, ops/loss.py), "auto"
    # (chunked for real vocabularies, full for tiny test models)
    loss_impl: str = "auto"
    vocab_chunk: int = 4096

    # --- schedule / cadence -----------------------------------------------------
    eval_step: int = 30
    save_steps: int = 500               # reference: iteration_save_model every 500
    log_steps: int = 100
    throughput_steps: int = 200         # reference: print_throughput every 200
    early_terminate: bool = False

    # --- parallelism (replaces --zero_stage/--offload + DS JSON) ----------------
    # Mesh axes: data (pure DP), fsdp (param/grad/opt-state sharding — the ZeRO
    # equivalent), tensor (megatron-style TP over hidden dims; 1 = off).
    mesh_shape: Optional[List[int]] = None   # e.g. [1, 8, 1]; None = all devices on fsdp
    mesh_axes: Sequence[str] = ("data", "fsdp", "tensor")

    # --- misc --------------------------------------------------------------------
    output_dir: Optional[str] = None
    seed: int = 1234
    # capture a jax.profiler device trace of steps [profile_start,
    # profile_start+profile_steps) into {profile_dir} (SURVEY §5.1: replaces
    # the reference's disabled DeepSpeed flops_profiler block)
    profile_dir: Optional[str] = None
    profile_start: int = 10
    profile_steps: int = 3
    add_eot_token: bool = False
    resume_from: Optional[str] = None   # orbax checkpoint dir (capability the reference lacks)

    # ------------------------------------------------------------------------
    def __post_init__(self):
        if isinstance(self.data_path, str):
            self.data_path = [self.data_path]
        if self.seq_buckets is None:
            self.seq_buckets = _default_buckets(self.max_seq_len)
        if self.matrix_sparsity and self.channel_sparsity:
            raise ValueError("matrix_sparsity and channel_sparsity are mutually exclusive")
        if self.selection_strategy not in ("no_restriction", "norm_dist"):
            raise ValueError(f"unknown selection_strategy {self.selection_strategy!r}")
        if self.calculate_strategy not in ("mean_abs", "abs_mean", "L1", "L2"):
            raise ValueError(f"unknown calculate_strategy {self.calculate_strategy!r}")
        if self.saliency_accumulation not in ("grad_sum", "per_step_stats", "auto"):
            raise ValueError(
                f"unknown saliency_accumulation {self.saliency_accumulation!r}")
        if self.sparse_impl not in ("oracle", "pallas", "auto"):
            raise ValueError(f"unknown sparse_impl {self.sparse_impl!r}")
        # dtype=fp16 runs with DeepSpeed-style dynamic loss scaling
        # (train/steps.py); bf16 remains the TPU-native recommendation.
        if self.attn_impl not in ("einsum", "flash", "fullk", "auto"):
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")
        if self.frozen_quant not in ("none", "int8", "auto"):
            raise ValueError(f"unknown frozen_quant {self.frozen_quant!r}")
        if self.head_quant not in ("none", "int8", "auto"):
            raise ValueError(f"unknown head_quant {self.head_quant!r}")
        if self.scan_layers not in ("off", "on", "auto"):
            raise ValueError(f"unknown scan_layers {self.scan_layers!r}")
        if self.loss_impl not in ("full", "chunked", "auto"):
            raise ValueError(f"unknown loss_impl {self.loss_impl!r}")

    @property
    def sparse_remat(self) -> bool:
        if self.sparse_gradient_checkpointing is None:
            return self.gradient_checkpointing
        return self.sparse_gradient_checkpointing

    @property
    def param_dtype(self):
        import jax.numpy as jnp
        return {"bf16": jnp.bfloat16, "fp16": jnp.float16, "fp32": jnp.float32}[self.dtype]

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "SMTConfig":
        raw = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


def _default_buckets(max_seq_len: int) -> List[int]:
    """Power-of-two padding buckets up to max_seq_len (always included)."""
    buckets, b = [], 128
    while b < max_seq_len:
        buckets.append(b)
        b *= 2
    buckets.append(max_seq_len)
    return buckets


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI mirroring reference deepspeed/fine_tune.py:870-1078 flag names."""
    p = argparse.ArgumentParser(description="TPU-native SMT fine-tuning")
    d = SMTConfig()
    p.add_argument("--data_path", action="append", type=str, required=True)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--per_device_ft_batch_size", type=int, default=d.per_device_ft_batch_size)
    p.add_argument("--per_device_eval_batch_size", type=int, default=d.per_device_eval_batch_size)
    p.add_argument("--max_seq_len", type=int, default=d.max_seq_len)
    p.add_argument("--eval_set_ratio", type=float, default=d.eval_set_ratio)
    p.add_argument("--eval_step", type=int, default=d.eval_step)
    p.add_argument("--ft_learning_rate", type=float, default=d.ft_learning_rate)
    p.add_argument("--w_decay", type=float, default=d.w_decay)
    p.add_argument("--num_ft_epochs", type=int, default=d.num_ft_epochs)
    p.add_argument("--gradient_accumulation_steps", type=int, default=d.gradient_accumulation_steps)
    p.add_argument("--lr_scheduler_type", type=str, default=d.lr_scheduler_type,
                   choices=["linear", "cosine", "constant"])
    p.add_argument("--lr_warmup_steps", type=int, default=d.lr_warmup_steps)
    p.add_argument("--smt_lr_warmup_steps", type=int, default=d.smt_lr_warmup_steps)
    p.add_argument("--full_ft_steps", type=int, default=d.full_ft_steps)
    p.add_argument("--dtype", type=str, default=d.dtype, choices=["fp16", "bf16", "fp32"])
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--add_eot_token", action="store_true")
    p.add_argument("--compute_fp32_loss", action="store_true")
    p.add_argument("--matrix_sparsity", action="store_true")
    p.add_argument("--channel_sparsity", action="store_true")
    p.add_argument("--qk_scheduler", action="store_true")
    p.add_argument("--qk_lr_times", type=int, default=d.qk_lr_times)
    p.add_argument("--early_terminate", action="store_true")
    p.add_argument("--downsample_attention_blocks_ratio", type=float,
                   default=d.downsample_attention_blocks_ratio)
    p.add_argument("--downsample_mlp_blocks_ratio", type=float,
                   default=d.downsample_mlp_blocks_ratio)
    p.add_argument("--num_mlp_channel", type=int, default=d.num_mlp_channel)
    p.add_argument("--num_attention_channel", type=int, default=d.num_attention_channel)
    p.add_argument("--selection_strategy", type=str, default=d.selection_strategy)
    p.add_argument("--calculate_strategy", type=str, default=d.calculate_strategy)
    p.add_argument("--no_limit_mixture", action="store_true")
    p.add_argument("--do_gradient_distribution_analysis", action="store_true")
    p.add_argument("--saliency_accumulation", type=str, default=None,
                   choices=["grad_sum", "per_step_stats", "auto"])
    p.add_argument("--smt_lr", type=float, default=d.smt_lr)
    # TPU-native additions
    p.add_argument("--sparse_impl", type=str, default=d.sparse_impl,
                   choices=["oracle", "pallas", "auto"])
    p.add_argument("--attn_impl", type=str, default=d.attn_impl,
                   choices=["einsum", "flash", "fullk", "auto"])
    p.add_argument("--frozen_quant", type=str, default=d.frozen_quant,
                   choices=["none", "int8", "auto"])
    p.add_argument("--no_frozen_host_offload", dest="frozen_host_offload",
                   action="store_false")
    p.add_argument("--head_quant", type=str, default=d.head_quant,
                   choices=["none", "int8", "auto"])
    p.add_argument("--scan_layers", type=str, default=d.scan_layers,
                   choices=["off", "on", "auto"])
    p.add_argument("--loss_impl", type=str, default=d.loss_impl,
                   choices=["full", "chunked", "auto"])
    p.add_argument("--vocab_chunk", type=int, default=d.vocab_chunk)
    p.add_argument("--sparse_from_plan", type=str, default=None)
    p.add_argument("--mesh_shape", type=int, nargs="*", default=None,
                   help="data fsdp tensor mesh dims; default = all devices on fsdp")
    p.add_argument("--seq_buckets", type=int, nargs="*", default=None)
    p.add_argument("--resume_from", type=str, default=None)
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--profile_start", type=int, default=10)
    p.add_argument("--profile_steps", type=int, default=3)
    p.add_argument("--no_gradient_checkpointing", dest="gradient_checkpointing",
                   action="store_false")
    # drop-in compatibility with reference/deepspeed launcher flags: parsed
    # and mapped or ignored (sharding over the mesh replaces ZeRO/offload)
    p.add_argument("--local_rank", type=int, default=-1,
                   help="ignored (JAX discovers devices itself)")
    p.add_argument("--zero_stage", type=int, default=0,
                   help="ignored: params/grads/opt-state always shard over "
                        "the fsdp mesh axis (ZeRO-3 equivalent)")
    p.add_argument("--offload", action="store_true",
                   help="ignored: no CPU offload on TPU; use more chips "
                        "(see PARITY.md D12)")
    p.add_argument("--sparse_gradient_checkpointing", type=lambda s: s == "true",
                   choices=[True, False], default=None, metavar="{true,false}",
                   help="override remat for the sparse phase only")
    return p


def parse_args(argv: Optional[Sequence[str]] = None) -> SMTConfig:
    ns = build_arg_parser().parse_args(argv)
    known = {f.name for f in dataclasses.fields(SMTConfig)}
    kwargs = {k: v for k, v in vars(ns).items() if k in known and v is not None}
    # argparse store_true defaults (False) should not override dataclass defaults
    # for flags whose dataclass default is True.
    if "compute_fp32_loss" in kwargs and not ns.compute_fp32_loss:
        kwargs.pop("compute_fp32_loss")
    return SMTConfig(**kwargs)


def effective_batch_size(cfg: SMTConfig, num_devices: int) -> int:
    """Global tokens-independent batch size (reference fine_tune.py:96-102)."""
    return cfg.per_device_ft_batch_size * num_devices * cfg.gradient_accumulation_steps


def num_update_steps_per_epoch(num_examples: int, cfg: SMTConfig, num_devices: int) -> int:
    per_step = cfg.per_device_ft_batch_size * num_devices
    return math.ceil(num_examples / per_step / cfg.gradient_accumulation_steps)
