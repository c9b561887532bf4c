"""Scan-over-layers sparse phase: state builder + step function.

The unrolled sparse step (train/steps.build_sparse_step) traces one program
copy per decoder layer; at 32 layers that compiles ~16 min over the v5e
tunnel and would be O(hours) at 70B/80-layer depth. This module rebuilds
the sparse phase around models.llama.forward_scan — ONE lax.scan body over
stacked layer params — so compile time is depth-independent (the same move
the decode path already made, llama.stack_layers).

What changes vs the unrolled phase:
  * per-layer block coordinates become traced (n,) arrays, padded to the
    per-module max count with inert duplicates (ops/sparse_linear.py
    smt_linear_dyn; dummy deltas are masked to zero and dummy grads zeroed)
  * the dense weights are NEVER scattered into: both precisions compute
    y = base_matmul(x, W_frozen) + x[:, cb] @ (blocks - base).T, where the
    frozen base is the conversion-time dense weight (bf16) or its int8
    quantization (mathematically identical to the unrolled scatter-at-
    update forward; fp association differs by one add)
  * state is keyed per MODULE ("q_proj") with stacked (L, ...) leaves,
    instead of per linear ("3.q_proj")

Reference mapping: same semantics as the unrolled phase (smt.py:302-413
linearZ, fine_tune.py:366-372 optimizer), reorganised for XLA compile
scaling — the reference (torch eager) has no compile-time dimension at all.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import (
    LlamaConfig, forward_scan, lm_head_weight,
)
from sparse_matrix_tuning_tpu.ops.sparse_linear import (
    _resolve_impl, frozen_q8_linear, smt_linear_dyn,
)
from sparse_matrix_tuning_tpu.smt.optimizer import (
    AdamConfig, adam_step, clip_by_global_norm, make_qk_lr_scale,
)
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, SMTPlan


def resolve_scan_layers(cfg: SMTConfig, model_cfg: LlamaConfig,
                        mode: str) -> bool:
    """"auto" enables the scan phase for deep models (where the unrolled
    compile time bites) in BOTH sparsity modes — matrix via smt_linear_dyn,
    channel via smt_channel_linear_dyn; fp16 runs carry the DeepSpeed-
    semantics dynamic loss scaler through the scan steps too, and dropout
    runs fold per-layer keys from the scanned layer index (forward_scan
    reproduces the unrolled fold_in stream exactly)."""
    if cfg.scan_layers == "off":
        return False
    supported = mode in ("matrix", "channel")
    if cfg.scan_layers == "on":
        if not supported:
            raise ValueError("scan_layers=on requires matrix or channel "
                             "mode")
        return True
    return supported and model_cfg.num_hidden_layers >= 12


def resolve_scan_warmup(cfg: SMTConfig, model_cfg: LlamaConfig):
    """Scan the WARM-UP phase too. Returns the warm-up scan mode —
    "matrix" (full-FT + stacked saliency harvest, build_scan_warmup_step),
    "channel" (forward-only stacked activation harvest,
    build_scan_channel_warmup_step), or None (unrolled warm-up).

    Engages with the sparse-phase scan conditions, for BOTH saliency
    accumulation modes: per_step_stats harvests tiny reduced stats inside
    the scanned step, and grad_sum (reference-exact full accumulators,
    fine_tune.py:729-740) accumulates the stacked (L, ...) fp32 grad /
    positional-activation sums directly — the stacked warm-up grads are
    exactly the per-layer grads, so selection matches the unrolled
    grad_sum path while compile time stays O(1-layer)
    (tests/test_scan_phase.py::test_scan_warmup_grad_sum_matches_unrolled).

    Call AFTER resolve_saliency_accumulation has resolved "auto"."""
    if cfg.matrix_sparsity:  # matrix/channel are mutually exclusive (config)
        return "matrix" if resolve_scan_layers(cfg, model_cfg,
                                               "matrix") else None
    if cfg.channel_sparsity:
        return "channel" if resolve_scan_layers(cfg, model_cfg,
                                                "channel") else None
    return None


def stack_layer_tree(layers: Dict[str, Dict], n_layers: int,
                     dtype=None) -> Dict[str, jax.Array]:
    keys = layers["0"].keys()
    out = {}
    for mod in keys:
        stacked = jnp.stack([layers[str(l)][mod] for l in range(n_layers)])
        out[mod] = stacked.astype(dtype) if dtype is not None else stacked
    return out


def init_scan_warmup_state(params, cfg: SMTConfig,
                           model_cfg: LlamaConfig) -> Dict:
    """Stacked twin of steps.init_warmup_state. Matrix mode: acc is
    {module: (L, RB, CB) fp32} per-step stats, or the full {module:
    (L, R, C) fp32} grad sums in grad_sum mode (reference-exact,
    fine_tune.py:729-740), plus the full-FT optimizer state. Channel
    mode: act_acc is {module: (L, C) fp32} stats or (L, S, C) positional
    sums in grad_sum mode, and NO optimizer/adam state at all — the
    channel warm-up is forward-only (reference fine_tune.py:708
    `continue`), so m/v of the full master (2x fp32 params, ~560 GB at
    70B) would be pure waste."""
    from sparse_matrix_tuning_tpu.models.llama import TARGET_MODULES
    from sparse_matrix_tuning_tpu.train.steps import (
        _wants_channel, _wants_saliency)

    L = model_cfg.num_hidden_layers
    master = {k: v.astype(jnp.float32) for k, v in params.items()
              if k != "layers"}
    master["layers_stacked"] = stack_layer_tree(params["layers"], L,
                                                jnp.float32)
    if cfg.channel_sparsity and not cfg.matrix_sparsity:
        act = {}
        for mod, w in master["layers_stacked"].items():
            if (w.ndim != 3 or mod not in TARGET_MODULES
                    or not _wants_channel(cfg, mod)):
                continue
            if cfg.saliency_accumulation == "grad_sum":
                # positional (S, C) |activation| sums per layer, exactly
                # the unrolled grad_sum accumulators (steps.py)
                act[mod] = jnp.zeros((L, cfg.max_seq_len, w.shape[2]),
                                     jnp.float32)
            else:
                act[mod] = jnp.zeros((L, w.shape[2]), jnp.float32)
        return {"master": master, "act_acc": act,
                "count": jnp.zeros((), jnp.int32),
                "step": jnp.zeros((), jnp.int32)}
    state = {
        "master": master,
        "m": jax.tree.map(jnp.zeros_like, master),
        "v": jax.tree.map(jnp.zeros_like, master),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }
    if cfg.dtype == "fp16":
        state["loss_scale"] = jnp.asarray(cfg.init_loss_scale, jnp.float32)
        state["good_steps"] = jnp.zeros((), jnp.int32)
    acc = {}
    for mod, w in master["layers_stacked"].items():
        # TARGET_MODULES gate matters: _wants_saliency alone would admit
        # o_proj (it treats every non-attention module as MLP), which is
        # never an SMT target — the unrolled init_warmup_state iterates
        # TARGET_MODULES explicitly (steps.py) and selection dims exclude
        # o_proj, so harvesting it here could select an unconvertible block
        if (w.ndim != 3 or mod not in TARGET_MODULES
                or not _wants_saliency(cfg, mod)):
            continue
        if w.shape[1] % BLOCK or w.shape[2] % BLOCK:
            continue  # excluded from selection (steps.init_warmup_state)
        if cfg.saliency_accumulation == "grad_sum":
            acc[mod] = jnp.zeros(w.shape, jnp.float32)  # full grad sums
        else:
            acc[mod] = jnp.zeros((L, w.shape[1] // BLOCK,
                                  w.shape[2] // BLOCK), jnp.float32)
    state["acc"] = acc
    return state


def build_scan_warmup_step(cfg: SMTConfig, model_cfg: LlamaConfig,
                           lr_sched: Callable) -> Callable:
    """Scan twin of steps.build_warmup_step: full-FT step + per-module
    stacked saliency harvest (unclipped averaged grads, reference
    fine_tune.py:716 quirk preserved)."""
    from sparse_matrix_tuning_tpu.smt.select import block_stats_step
    from sparse_matrix_tuning_tpu.smt.optimizer import full_ft_wd_mask
    from sparse_matrix_tuning_tpu.train.convert import harvest_strategy
    from sparse_matrix_tuning_tpu.train.steps import (
        accumulated_value_and_grad, _cast_tree)

    adam_cfg = AdamConfig(betas=tuple(cfg.warmup_adam_betas), eps=cfg.adam_eps,
                          weight_decay=cfg.w_decay, grad_clip=cfg.grad_clip)
    param_dtype = cfg.param_dtype
    lr_scale = make_qk_lr_scale(cfg.qk_lr_times) if cfg.qk_scheduler else None
    use_ls = cfg.dtype == "fp16"
    # same stream as the unrolled warm-up step (steps.build_warmup_step)
    base_rng = jax.random.PRNGKey(cfg.seed) if cfg.dropout > 0 else None

    def step(state: Dict, batch: Dict) -> tuple:
        drng = (jax.random.fold_in(base_rng, state["step"])
                if base_rng is not None else None)

        def loss_of(master, mb):
            params = _cast_tree(master, param_dtype)
            raw = _warmup_scan_loss(params, mb, cfg, model_cfg,
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
        acc = {}
        for mod in state["acc"]:
            g3 = grads["layers_stacked"][mod].astype(jnp.float32)
            if cfg.saliency_accumulation == "grad_sum":
                # reference-exact: accumulate the full (L, R, C) grad sum
                # (fine_tune.py:729-740); the stacked grad IS the per-layer
                # grad, so selection matches the unrolled grad_sum path
                acc[mod] = state["acc"][mod] + g3
            else:
                strat = harvest_strategy(cfg, mod)
                acc[mod] = state["acc"][mod] + jax.vmap(
                    lambda g, s=strat: block_stats_step(g, s))(g3)
        new_state["acc"] = acc

        grads, gnorm = clip_by_global_norm(grads, adam_cfg.grad_clip)
        lr = lr_sched(state["step"])
        opt_state = {"m": state["m"], "v": state["v"], "count": state["count"]}
        new_master, opt_state = adam_step(grads, opt_state, state["master"],
                                          lr, adam_cfg, lr_scale=lr_scale,
                                          wd_mask=full_ft_wd_mask)
        metrics = {"loss": loss, "grad_norm": gnorm, "lr": lr}
        if use_ls:
            from sparse_matrix_tuning_tpu.train.steps import (
                _select_tree, update_loss_scale)
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_master = _select_tree(finite, new_master, state["master"])
            opt_state = {
                "m": _select_tree(finite, opt_state["m"], state["m"]),
                "v": _select_tree(finite, opt_state["v"], state["v"]),
                "count": jnp.where(finite, opt_state["count"], state["count"]),
            }
            # saliency must not absorb inf/nan grads from a skipped step
            new_state["acc"] = _select_tree(finite, new_state["acc"],
                                            state["acc"])
            scale, good = update_loss_scale(state["loss_scale"],
                                            state["good_steps"], finite,
                                            cfg.loss_scale_window)
            new_state.update(loss_scale=scale, good_steps=good)
            metrics.update(loss_scale=state["loss_scale"], overflow=~finite)
        new_state.update(master=new_master, m=opt_state["m"],
                         v=opt_state["v"], count=opt_state["count"],
                         step=state["step"] + 1)
        return new_state, metrics

    return step


def _warmup_scan_loss(params, batch, cfg: SMTConfig, model_cfg: LlamaConfig,
                      dropout_rng=None):
    from sparse_matrix_tuning_tpu.models.llama import causal_lm_loss
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss
    from sparse_matrix_tuning_tpu.train.steps import _use_chunked_loss

    kw = dict(attention_mask=batch.get("attention_mask"),
              remat=cfg.gradient_checkpointing,
              attn_impl=cfg.attn_impl,
              dropout_rng=dropout_rng)
    if _use_chunked_loss(cfg, model_cfg):
        hidden = forward_scan(params, batch["input_ids"], model_cfg,
                              return_hidden=True, **kw)
        return chunked_causal_lm_loss(hidden, lm_head_weight(params, model_cfg),
                                      batch["labels"], cfg.vocab_chunk)
    logits = forward_scan(params, batch["input_ids"], model_cfg, **kw)
    return causal_lm_loss(logits, batch["labels"])


def build_scan_channel_warmup_step(cfg: SMTConfig,
                                   model_cfg: LlamaConfig) -> Callable:
    """Scan twin of steps.build_channel_warmup_step: ONE forward_scan with
    per-layer activation taps reduced to (C,) channel stats inside the scan
    body (models/llama.py forward_scan activation_taps/tap_reduce), so the
    warm-up compiles in O(1-layer) time at any depth — the unrolled channel
    warm-up traces L program copies, and the reference runs L sequential
    per-layer hook passes (fine_tune.py:586-708). Forward-only, no training
    (reference `continue` at :708); pad positions masked like the unrolled
    step. In grad_sum mode each layer's tap is zero-padded to the
    (max_seq_len, C) positional form instead of being reduced, matching
    the unrolled grad_sum accumulators exactly (steps.py)."""
    from sparse_matrix_tuning_tpu.models.llama import causal_lm_loss
    from sparse_matrix_tuning_tpu.smt.select import channel_stats
    from sparse_matrix_tuning_tpu.train.convert import harvest_strategy
    from sparse_matrix_tuning_tpu.train.steps import (
        _cast_tree, _wants_channel)

    param_dtype = cfg.param_dtype

    def tap_reduce(module: str, tap: jax.Array):
        if not _wants_channel(cfg, module):
            return None  # dropped from the scan ys entirely
        if cfg.saliency_accumulation == "grad_sum":
            pad = cfg.max_seq_len - tap.shape[0]
            if pad < 0:
                raise ValueError(
                    f"batch sequence length {tap.shape[0]} exceeds "
                    f"cfg.max_seq_len={cfg.max_seq_len}: the positional "
                    "(S, C) activation accumulators are sized to "
                    "max_seq_len (ADVICE r4; the unrolled path fails the "
                    "same way, just later and less legibly)")
            return jnp.pad(tap, ((0, pad), (0, 0))) if pad > 0 else tap
        return channel_stats(tap, harvest_strategy(cfg, module))  # (C,)

    def step(state: Dict, batch: Dict) -> tuple:
        params = _cast_tree(state["master"], param_dtype)
        taps: Dict[str, jax.Array] = {}
        logits = forward_scan(params, batch["input_ids"], model_cfg,
                              attention_mask=batch.get("attention_mask"),
                              remat=False, attn_impl=cfg.attn_impl,
                              activation_taps=taps, tap_reduce=tap_reduce)
        loss = causal_lm_loss(logits, batch["labels"])
        new_state = dict(state)
        new_state["act_acc"] = {mod: state["act_acc"][mod] + taps[mod]
                                for mod in state["act_acc"]}
        new_state["step"] = state["step"] + 1
        return new_state, {"loss": loss}

    return step


def convert_from_scan_warmup(cfg: SMTConfig, warmup_state: Dict,
                             model_cfg: LlamaConfig, all_2d_shapes):
    """Selection + scan sparse state from a SCAN warm-up state: unstack the
    tiny (L, RB, CB) stats into the keyed form convert.build_plan consumes,
    synthesize shape-only per-layer dims, then build the stacked phase-2
    state directly from the stacked master."""
    from sparse_matrix_tuning_tpu.train.convert import build_plan

    L = model_cfg.num_hidden_layers
    shape_layers = {
        str(l): {mod: jax.ShapeDtypeStruct(w.shape[1:], w.dtype)
                 for mod, w in warmup_state["master"]["layers_stacked"].items()}
        for l in range(L)
    }
    view = dict(warmup_state)
    stat_key = "acc" if "acc" in warmup_state else "act_acc"
    keyed = {}
    for mod, a in warmup_state[stat_key].items():
        # multi-host: the stacked accumulators are globally-sharded jax.Arrays
        # whose shards span non-addressable devices — a bare np.asarray raises
        # there; _host_global allgathers (collective: every process reaches
        # this through the conversion event, matching the reference's
        # all-rank selection sync, deepspeed_helpers.py:177-200).
        host = _host_global(a)
        for l in range(L):
            keyed[f"{l}.{mod}"] = jnp.asarray(host[l])
    view[stat_key] = keyed
    view["master"] = dict(warmup_state["master"])
    view["master"]["layers"] = shape_layers
    plan = build_plan(cfg, view, all_2d_shapes)
    if not plan.linears:
        raise ValueError("SMT selection produced zero trainable blocks")
    state = build_scan_sparse_state(cfg, warmup_state, plan, model_cfg)
    return plan, state


def stack_plan_indices(plan: SMTPlan, n_layers: int) -> Dict[str, Dict]:
    """Per-module stacked coordinate arrays. Matrix mode: {"rb"/"cb":
    (L, n) int32, "valid": (L, n) bool}; channel mode: {"ci": (L, n) int32,
    "valid": (L, n) bool}. Layers with fewer (or zero) entries are padded
    with duplicates of their first entry (coord 0 when the layer has
    none) — inert because deltas are masked by `valid` and grads zeroed."""
    mods = sorted({lp.module for lp in plan.linears.values()})
    out = {}
    for mod in mods:
        per_layer = {lp.layer: lp for lp in plan.linears.values()
                     if lp.module == mod}
        if plan.mode == "channel":
            n_max = max(len(lp.channels) for lp in per_layer.values())
            ci = np.zeros((n_layers, n_max), np.int32)
            valid = np.zeros((n_layers, n_max), bool)
            for l in range(n_layers):
                lp = per_layer.get(l)
                if lp is None:
                    continue
                k = len(lp.channels)
                ci[l, :k] = lp.channels
                valid[l, :k] = True
                ci[l, k:] = ci[l, 0]
            out[mod] = {"ci": jnp.asarray(ci), "valid": jnp.asarray(valid)}
            continue
        n_max = max(len(lp.blocks) for lp in per_layer.values())
        rb = np.zeros((n_layers, n_max), np.int32)
        cb = np.zeros((n_layers, n_max), np.int32)
        valid = np.zeros((n_layers, n_max), bool)
        for l in range(n_layers):
            lp = per_layer.get(l)
            if lp is None:
                continue
            k = len(lp.blocks)
            rb[l, :k] = lp.row_blocks()
            cb[l, :k] = lp.col_blocks()
            valid[l, :k] = True
            rb[l, k:] = rb[l, 0]
            cb[l, k:] = cb[l, 0]
        out[mod] = {"rb": jnp.asarray(rb), "cb": jnp.asarray(cb),
                    "valid": jnp.asarray(valid)}
    return out


def _gather_blocks(w, rb, cb):
    """(O, I) weight + (n,) coords -> (n, 256, 256) fp32 (traced coords)."""
    w4 = w.reshape(w.shape[0] // BLOCK, BLOCK, w.shape[1] // BLOCK, BLOCK)
    return w4[rb, :, cb, :].astype(jnp.float32)


def _gather_cols(w, ci):
    """(O, I) weight + (n,) channel indices -> (O, n) fp32 columns."""
    return jnp.take(w, ci, axis=1).astype(jnp.float32)


def _plan_gather(plan_mode: str, w, meta_l):
    if plan_mode == "channel":
        return _gather_cols(w, meta_l["ci"])
    return _gather_blocks(w, meta_l["rb"], meta_l["cb"])


def build_scan_sparse_state(cfg: SMTConfig, warmup_state: Dict,
                            plan: SMTPlan, model_cfg: LlamaConfig) -> Dict:
    """Stacked phase-2 state from the warm-up master (mirrors
    convert.convert + steps.init_sparse_state for the scan layout)."""
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    from sparse_matrix_tuning_tpu.train.convert import (
        LAYER_LINEARS, resolve_frozen_quant)

    master = warmup_state["master"]
    L = model_cfg.num_hidden_layers
    idx = stack_plan_indices(plan, L)
    use_q8 = resolve_frozen_quant(cfg, plan.mode, scan=True) == "int8"

    params = {k: v.astype(cfg.param_dtype) for k, v in master.items()
              if k not in ("layers", "layers_stacked")}
    if "layers_stacked" in master:  # scan warm-up: already stacked
        stacked = {mod: w.astype(cfg.param_dtype)
                   for mod, w in master["layers_stacked"].items()}

        def layer_weight(mod, l):
            return master["layers_stacked"][mod][l]
    else:
        layer_keys = master["layers"]["0"].keys()
        stacked = {
            mod: jnp.stack([master["layers"][str(l)][mod] for l in range(L)]
                           ).astype(cfg.param_dtype)
            for mod in layer_keys
        }

        def layer_weight(mod, l):
            return master["layers"][str(l)][mod]
    params["layers_stacked"] = stacked

    trainable, base, q = {}, {}, {}
    if use_q8:
        for mod in LAYER_LINEARS:
            if mod not in stacked or stacked[mod].ndim != 3:
                continue
            per = [quantize_weight(layer_weight(mod, l)) for l in range(L)]
            q[mod] = {"wq": jnp.stack([p[0] for p in per]),
                      "sw": jnp.stack([p[1] for p in per])}
    for mod, meta in idx.items():
        rows = []
        brows = []
        for l in range(L):
            w = layer_weight(mod, l)
            meta_l = {k: v[l] for k, v in meta.items()}
            rows.append(_plan_gather(plan.mode, w, meta_l))
            if use_q8:
                wd = (q[mod]["wq"][l].astype(jnp.float32)
                      * q[mod]["sw"][l][:, None])
                brows.append(_plan_gather(plan.mode, wd, meta_l))
        trainable[mod] = jnp.stack(rows)
        # bf16 base == initial block/column values (delta starts at 0); q8
        # base == dequantized frozen values (delta corrects quantization
        # exactly). A distinct buffer — state leaves must not alias
        # (donation).
        base[mod] = (jnp.stack(brows) if use_q8
                     else jnp.array(trainable[mod], copy=True))

    state = {
        "params": params,
        "trainable": trainable,
        "base": base,
        "idx": idx,
        "m": jax.tree.map(jnp.zeros_like, trainable),
        "v": jax.tree.map(jnp.zeros_like, trainable),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.asarray(int(warmup_state["step"]), jnp.int32),
    }
    if cfg.dtype == "fp16":
        # fresh scaler for phase 2, like steps.init_sparse_state
        state["loss_scale"] = jnp.asarray(cfg.init_loss_scale, jnp.float32)
        state["good_steps"] = jnp.zeros((), jnp.int32)
    if use_q8:
        state["q"] = q
    from sparse_matrix_tuning_tpu.train.convert import (
        build_q_head, resolve_head_quant)
    if resolve_head_quant(cfg, model_cfg,
                          "int8" if use_q8 else "none") == "int8":
        state["q_head"] = build_q_head(master, model_cfg)
    return state


def build_scan_state_from_hf(cfg: SMTConfig, model_dir: str, plan: SMTPlan,
                             model_cfg: Optional[LlamaConfig] = None,
                             keep_host: bool = True):
    """Quantize-on-load: stream a local HF checkpoint STRAIGHT into the
    int8 scan sparse state, one tensor at a time — full-precision weights
    never co-reside on device (peak transient = one layer linear's bf16).

    This is what makes the 8B-on-one-16G-chip sparse phase (bench
    `big_model`) real for actual checkpoints: warm-up + selection run
    elsewhere (e.g. a sharded pod), and the resulting plan.json + base
    checkpoint continue on a single chip. Returns (state, host_frozen) —
    host_frozen holds the original bf16 layer weights for exact export
    (None when keep_host=False).

    Replaces the reference's full-precision model load + ZeRO placement
    (fine_tune.py:107-131, deepspeed_helpers.py:533-572), which has no
    quantized-load path at all."""
    from sparse_matrix_tuning_tpu.models.hf_io import (
        load_hf_config, _hf_to_tree_name)
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    from sparse_matrix_tuning_tpu.train.convert import (
        LAYER_LINEARS, resolve_frozen_quant)

    import os
    from safetensors import safe_open

    model_cfg = model_cfg or load_hf_config(model_dir)
    if resolve_frozen_quant(cfg, plan.mode, scan=True) != "int8":
        raise ValueError("quantize-on-load is the int8 path — set "
                         "--frozen_quant int8 (or auto on TPU); a bf16 "
                         "continuation can load normally and convert")
    L = model_cfg.num_hidden_layers
    idx = stack_plan_indices(plan, L)

    # hf key -> file map
    st_files = sorted(f for f in os.listdir(model_dir)
                      if f.endswith(".safetensors"))
    if not st_files:
        raise FileNotFoundError(f"no .safetensors in {model_dir} "
                                "(quantize-on-load requires safetensors)")
    where = {}
    for fname in st_files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for k in f.keys():
                where[k] = fname

    tree_to_hf = {}
    for k in where:
        path = _hf_to_tree_name(k)
        if path is not None:
            tree_to_hf[path] = k

    def read(path):
        k = tree_to_hf[path]
        with safe_open(os.path.join(model_dir, where[k]),
                       framework="np") as f:
            return f.get_tensor(k)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def quant_gather(w, rb, cb):
        wq, sw = quantize_weight(w)
        w4 = w.reshape(w.shape[0] // BLOCK, BLOCK, w.shape[1] // BLOCK, BLOCK)
        t = w4[rb, :, cb, :].astype(jnp.float32)
        wd = (wq.astype(jnp.float32) * sw[:, None]).reshape(w4.shape)
        return wq, sw, t, wd[rb, :, cb, :]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def quant_gather_chan(w, ci):
        wq, sw = quantize_weight(w)
        t = jnp.take(w, ci, axis=1).astype(jnp.float32)
        wd = wq.astype(jnp.float32) * sw[:, None]
        return wq, sw, t, jnp.take(wd, ci, axis=1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def quant_only(w):  # unplanned modules; shape need not be 256-divisible
        return quantize_weight(w)

    q, trainable, base, host = {}, {}, {}, {}
    stacked: Dict[str, jax.Array] = {}
    other_layer_keys = set()
    for mod in LAYER_LINEARS:
        if ("layers", "0", mod) not in tree_to_hf:
            continue
        meta = idx.get(mod)
        wqs, sws, ts, bs, hs = [], [], [], [], []
        for l in range(L):
            w_host = read(("layers", str(l), mod))
            if keep_host:
                hs.append(w_host)
            w = jnp.asarray(w_host).astype(cfg.param_dtype)
            if meta is not None:
                if plan.mode == "channel":
                    wq, sw, t, b = quant_gather_chan(w, meta["ci"][l])
                else:
                    wq, sw, t, b = quant_gather(w, meta["rb"][l],
                                                meta["cb"][l])
                ts.append(t)
                bs.append(b)
            else:
                wq, sw = quant_only(w)
            wqs.append(wq)
            sws.append(sw)
        q[mod] = {"wq": jnp.stack(wqs), "sw": jnp.stack(sws)}
        if meta is not None:
            trainable[mod] = jnp.stack(ts)
            base[mod] = jnp.stack(bs)
        if keep_host:
            host[mod] = np.stack(hs)
        stacked[mod] = jnp.zeros((L, 1), jnp.bfloat16)  # offloaded

    # non-quantized per-layer leaves (layernorms, qkv biases)
    for path in tree_to_hf:
        if path[0] == "layers" and path[2] not in q:
            other_layer_keys.add(path[2])
    for name in sorted(other_layer_keys):
        stacked[name] = jnp.stack(
            [jnp.asarray(read(("layers", str(l), name))).astype(cfg.param_dtype)
             for l in range(L)])

    params: Dict = {"layers_stacked": stacked}
    for top in ("embed_tokens", "norm", "lm_head"):
        if (top,) in tree_to_hf:
            params[top] = jnp.asarray(read((top,))).astype(cfg.param_dtype)
    if model_cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    elif "lm_head" not in params:
        # silently substituting the embedding would both mask a malformed
        # checkpoint and alias two leaves of a donated state
        raise ValueError(
            f"checkpoint {model_dir} has no lm_head tensor but "
            "tie_word_embeddings is False — malformed or mis-configured "
            "checkpoint")

    state = {
        "params": params,
        "trainable": trainable,
        "base": base,
        "idx": idx,
        "m": jax.tree.map(jnp.zeros_like, trainable),
        "v": jax.tree.map(jnp.zeros_like, trainable),
        "count": jnp.zeros((), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
        "q": q,
    }
    from sparse_matrix_tuning_tpu.train.convert import (
        build_q_head, offload_lm_head, resolve_head_quant)
    if resolve_head_quant(cfg, model_cfg, "int8") == "int8":
        state["q_head"] = build_q_head(params, model_cfg)
        state["params"] = offload_lm_head(params, host, keep_host)
    return state, (host if keep_host else None)


def offload_scan_frozen_to_host(state: Dict, keep_host: bool = True):
    """Scan-layout twin of convert.offload_frozen_to_host: in int8 mode the
    stacked dense weights of quantized modules are compute-dead — move them
    to host, leaving (L, 1) placeholders. On multi-process meshes each
    process keeps only its addressable shards (convert.HostShards, VERDICT
    r4 next #7); export reassembles via host_frozen_global."""
    from sparse_matrix_tuning_tpu.train.convert import _to_host_store
    host: Dict[str, np.ndarray] = {}
    stacked = dict(state["params"]["layers_stacked"])
    for mod in state["q"]:
        w = stacked[mod]
        if keep_host:
            host[mod] = _to_host_store(w)
        stacked[mod] = jnp.zeros((w.shape[0], 1), w.dtype)
    params = dict(state["params"])
    params["layers_stacked"] = stacked
    if "q_head" in state:
        # int8 head: the untied bf16 lm_head is compute-dead in both loss
        # paths (convert.offload_frozen_to_host twin)
        from sparse_matrix_tuning_tpu.train.convert import offload_lm_head
        params = offload_lm_head(params, host, keep_host)
    new_state = dict(state)
    new_state["params"] = params
    return new_state, host


def make_scan_dispatch(impl: str, mode: str = "matrix"):
    """The linear_scan hook for forward_scan: planned modules run the
    dynamic-index sparse custom_vjp (matrix blocks or channel columns);
    other quantized modules the plain q8 path; everything else a dense
    matmul."""
    from sparse_matrix_tuning_tpu.ops.sparse_linear import (
        frozen_q4_linear, frozen_q4_linear_stacked, smt_channel_linear_dyn)

    def linear_scan(x, w, module: str, ex):
        q4s = ex.get("q4s", {}).get(module)
        qmod = ex.get("q", {}).get(module)
        t = ex["t"].get(module)
        if t is not None:
            meta = ex["idx"][module]
            # frozen-base dict keys pick the matmul: {"w4s",...} stacked
            # int4 (scan decode, scalar-prefetch layer index), {"w4","s4"}
            # per-layer int4, {"wq","sw"} int8, {"w"} dense bf16.
            if q4s is not None:
                frozen = {**q4s, "l": ex["l"]}
            elif qmod is not None:
                frozen = dict(qmod)
            else:
                frozen = {"w": w}
            if mode == "channel":
                return smt_channel_linear_dyn(impl, x, t, meta["ci"],
                                              meta["valid"], frozen,
                                              ex["base"][module])
            return smt_linear_dyn(impl, x, t, meta["rb"], meta["cb"],
                                  meta["valid"], frozen, ex["base"][module])
        if q4s is not None:
            return frozen_q4_linear_stacked(x, q4s["w4s"], q4s["slt"],
                                            q4s["sht"], q4s["s4s"], ex["l"])
        if qmod is not None:
            if "w4" in qmod:
                return frozen_q4_linear(x, qmod["w4"], qmod["s4"])
            return frozen_q8_linear(x, qmod["wq"], qmod["sw"])
        return jnp.einsum("...i,oi->...o", x, w)
    return linear_scan


def _scan_loss(state: Dict, batch: Dict, trainable, cfg: SMTConfig,
               model_cfg: LlamaConfig, lowest_layer: Optional[int],
               mode: str = "matrix", dropout_rng=None):
    from sparse_matrix_tuning_tpu.models.llama import causal_lm_loss
    from sparse_matrix_tuning_tpu.ops.loss import chunked_causal_lm_loss
    from sparse_matrix_tuning_tpu.train.steps import _use_chunked_loss

    layer_xs = {"t": trainable, "idx": state["idx"], "base": state["base"]}
    if "q" in state:
        layer_xs["q"] = state["q"]
    kw = dict(layer_xs=layer_xs,
              linear_scan=make_scan_dispatch(cfg.sparse_impl, mode),
              attention_mask=batch.get("attention_mask"),
              remat=cfg.sparse_remat,
              stop_grad_below_layer=lowest_layer,
              attn_impl=cfg.attn_impl,
              dropout_rng=dropout_rng)
    b, sq = batch["input_ids"].shape
    if _use_chunked_loss(cfg, model_cfg, sparse=True,
                         batch_tokens=b * (sq - 1)):
        hidden = forward_scan(state["params"], batch["input_ids"], model_cfg,
                              return_hidden=True, **kw)
        if "q_head" in state:
            from sparse_matrix_tuning_tpu.ops.loss import (
                chunked_causal_lm_loss_q8)
            return chunked_causal_lm_loss_q8(hidden, state["q_head"]["wq"],
                                             state["q_head"]["sw"],
                                             batch["labels"], cfg.vocab_chunk)
        return chunked_causal_lm_loss(hidden,
                                      lm_head_weight(state["params"], model_cfg),
                                      batch["labels"], cfg.vocab_chunk)
    if "q_head" in state:
        # int8 frozen lm-head on the dense loss path (see
        # steps.compute_loss q_head notes; same resolve, same vjp)
        hidden = forward_scan(state["params"], batch["input_ids"], model_cfg,
                              return_hidden=True, **kw)
        logits = frozen_q8_linear(hidden.astype(jnp.float32),
                                  state["q_head"]["wq"],
                                  state["q_head"]["sw"])
        return causal_lm_loss(logits, batch["labels"])
    logits = forward_scan(state["params"], batch["input_ids"], model_cfg, **kw)
    return causal_lm_loss(logits, batch["labels"])


def build_scan_sparse_step(cfg: SMTConfig, model_cfg: LlamaConfig,
                           plan: SMTPlan, lr_sched: Callable) -> Callable:
    """Scan twin of steps.build_sparse_step (same optimizer semantics: qk
    lr boost keys still match module names; grad clip on the global norm of
    VALID block grads)."""
    from sparse_matrix_tuning_tpu.train.steps import accumulated_value_and_grad

    betas = (cfg.matrix_adam_betas if plan.mode == "matrix"
             else cfg.channel_adam_betas)
    adam_cfg = AdamConfig(betas=tuple(betas), eps=cfg.adam_eps,
                          weight_decay=cfg.w_decay, grad_clip=cfg.grad_clip)
    lr_scale = make_qk_lr_scale(cfg.qk_lr_times) if cfg.qk_scheduler else None
    lowest_layer = min(lp.layer for lp in plan.linears.values())
    use_ls = cfg.dtype == "fp16"  # DeepSpeed-semantics dynamic loss scaling
    # same stream as the unrolled sparse step (steps.build_sparse_step)
    base_rng = jax.random.PRNGKey(cfg.seed + 1) if cfg.dropout > 0 else None

    def step(state: Dict, batch: Dict) -> tuple:
        drng = (jax.random.fold_in(base_rng, state["step"])
                if base_rng is not None else None)

        def loss_of(trainable, mb):
            raw = _scan_loss(state, mb, trainable, cfg, model_cfg,
                             lowest_layer, plan.mode, dropout_rng=drng)
            return raw * state["loss_scale"] if use_ls else raw

        vag = accumulated_value_and_grad(loss_of, batch,
                                         cfg.gradient_accumulation_steps)
        loss, grads = vag(state["trainable"], batch)
        if use_ls:
            inv = 1.0 / state["loss_scale"]
            loss = loss * inv
            grads = jax.tree.map(lambda g: g.astype(jnp.float32) * inv, grads)
        # zero the padded duplicates' garbage grads before the global norm;
        # matrix grads are (L, n, 256, 256), channel grads (L, O, n)
        if plan.mode == "channel":
            grads = {mod: g * state["idx"][mod]["valid"].astype(g.dtype)[:, None, :]
                     for mod, g in grads.items()}
        else:
            grads = {mod: g * state["idx"][mod]["valid"].astype(g.dtype)[..., None, None]
                     for mod, g in grads.items()}
        grads, gnorm = clip_by_global_norm(grads, adam_cfg.grad_clip)
        lr = lr_sched(state["count"])
        opt_state = {"m": state["m"], "v": state["v"], "count": state["count"]}
        new_trainable, opt_state = adam_step(grads, opt_state,
                                             state["trainable"], lr,
                                             adam_cfg, lr_scale=lr_scale)
        metrics = {"loss": loss, "grad_norm": gnorm, "lr": lr}
        new_state = dict(state)
        if use_ls:
            from sparse_matrix_tuning_tpu.train.steps import (
                _select_tree, update_loss_scale)
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
        new_state.update(trainable=new_trainable, m=opt_state["m"],
                         v=opt_state["v"], count=opt_state["count"],
                         step=state["step"] + 1)
        return new_state, metrics

    return step


def build_scan_eval_step(cfg: SMTConfig, model_cfg: LlamaConfig,
                         plan: SMTPlan) -> Callable:
    def step(state, batch) -> jax.Array:
        return _scan_loss(state, batch, state["trainable"], cfg, model_cfg,
                          lowest_layer=None, mode=plan.mode)
    return step


def _host_global(x) -> np.ndarray:
    """Bring an array to host as the GLOBAL value. On a multi-host pod the
    state leaves are globally-sharded jax.Arrays with non-addressable
    shards, where a bare np.asarray raises — every process allgathers
    (collective: all hosts must reach this) and gets the full value, so
    rank-0 can write the export (reference rank-0 save,
    deepspeed_helpers.py:341-364). Single-host arrays pass straight
    through (VERDICT r2 missing #4)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _scatter_trained_layer(w: np.ndarray, mode: str, meta_host: Dict,
                           l: int) -> None:
    """In-place vectorized scatter of layer l's valid trained blocks/
    columns into the (O, I) host weight (replaces the per-block Python
    loop — at 70B dims the loop was the export bottleneck, VERDICT r4
    weak #6; reference export is a cheap in-place copy,
    smt.py:416-457)."""
    j = np.nonzero(meta_host["valid"][l])[0]
    if not j.size:
        return
    t = meta_host["t"]
    if mode == "channel":
        w[:, meta_host["ci"][l, j]] = t[l][:, j].astype(w.dtype)
        return
    w4 = w.reshape(w.shape[0] // BLOCK, BLOCK, w.shape[1] // BLOCK, BLOCK)
    w4[meta_host["rb"][l, j], :, meta_host["cb"][l, j], :] = \
        t[l, j].astype(w.dtype)


def merged_params_from_scan(state: Dict, plan: SMTPlan,
                            model_cfg: LlamaConfig,
                            host_frozen: Optional[Dict] = None) -> Dict:
    """Unstack back to the per-layer HF layout with trained blocks scattered
    in (host-side numpy; exact bf16 export regardless of int8 compute).
    Multi-host safe: sharded leaves are allgathered (collective — every
    process must call this, see trainer._save); device leaves stream
    through _host_global one LAYER SLICE at a time so peak host RAM is
    bounded by the output + one slice, not output + a full (L, O, I)
    stack (VERDICT r4 next #6). host_frozen entries may be full np arrays
    (single-process offload) or convert.HostShards (multi-process — each
    process holds only its shards; reassembled here, also collective)."""
    from sparse_matrix_tuning_tpu.train.convert import HostShards
    L = model_cfg.num_hidden_layers
    stacked = state["params"]["layers_stacked"]
    layers: Dict[str, Dict] = {str(l): {} for l in range(L)}
    # tiny per-module coordinate/trainable arrays, gathered once
    meta_host = {}
    for mod, meta in state["idx"].items():
        meta_host[mod] = {k: _host_global(v) for k, v in meta.items()}
        meta_host[mod]["t"] = _host_global(state["trainable"][mod])
    for mod in stacked:
        entry = host_frozen.get(mod) if host_frozen is not None else None
        planned = mod in meta_host
        if isinstance(entry, HostShards):
            src = entry.restore()   # global sharded array, transient HBM
            entry = None
        elif entry is None:
            src = stacked[mod]
        else:
            src = None              # full host np from single-process offload
        for l in range(L):
            if src is not None:
                w = _host_global(src[l])
                if planned and w.ndim == 2:
                    w = np.array(w)  # device-buffer views are read-only
            else:
                # copy only planned modules: the scatter must not mutate
                # the host_frozen store
                w = entry[l].copy() if planned and entry[l].ndim == 2 \
                    else entry[l]
            if planned and w.ndim == 2:
                _scatter_trained_layer(w, plan.mode, meta_host[mod], l)
            layers[str(l)][mod] = w
    params = {k: _host_global(v) for k, v in state["params"].items()
              if k != "layers_stacked"}
    if host_frozen is not None and "lm_head" in host_frozen:
        from sparse_matrix_tuning_tpu.train.convert import host_frozen_global
        params["lm_head"] = host_frozen_global(host_frozen["lm_head"])
    params["layers"] = layers
    return params


def requantize_scan_base_int4(state: Dict, consume: bool = False):
    """Convert an int8 scan state's frozen base to the nibble-packed int4
    layout for DECODE (ops/quant.py int4 notes): returns (q4, base4) where
    q4[mod] = {"w4": (L, O, I/2) int8, "s4": (L, O, I/128) fp32} and
    base4 re-gathers the selected block/column values from the DEQUANTIZED
    int4 base, so the dynamic-index corrections keep the selected weights
    exact against the int4 base (only the frozen remainder carries int4
    noise — the same exactness argument as the q8 training path).

    Layer-streamed via lax.map: the transient is one layer's fp32 dense
    weight. consume=True deletes each int8 module from state["q"] as its
    int4 twin is built (halves peak HBM during conversion; the state stops
    being trainable — eval-CLI / decode-only use)."""
    from sparse_matrix_tuning_tpu.ops.quant import (
        dequantize_weight, dequantize_weight_int4, quantize_weight_int4)

    if "q" not in state:
        raise ValueError("requantize_scan_base_int4 needs an int8 scan "
                         "state (state['q'] missing)")
    idx = state.get("idx", {})

    def conv_layer(args):
        wq_l, sw_l = args
        return quantize_weight_int4(dequantize_weight(wq_l, sw_l,
                                                      jnp.float32))

    q4: Dict = {}
    for mod in sorted(state["q"]):
        wq = state["q"][mod]["wq"]
        sw = state["q"][mod]["sw"]
        w4, s4 = jax.lax.map(conv_layer, (wq, sw))
        q4[mod] = {"w4": w4, "s4": s4}
        if consume:
            del state["q"][mod]

    base4: Dict = {}
    for mod, meta in idx.items():
        mode = "channel" if "ci" in meta else "matrix"

        def base_layer(args, _mode=mode):
            leaves = args
            wd = dequantize_weight_int4(leaves["w4"], leaves["s4"],
                                        jnp.float32)
            return _plan_gather(_mode, wd, leaves["meta"])

        base4[mod] = jax.lax.map(
            base_layer, {"w4": q4[mod]["w4"], "s4": q4[mod]["s4"],
                         "meta": dict(meta)})
    return q4, base4
