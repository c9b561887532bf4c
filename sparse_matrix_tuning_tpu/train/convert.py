"""The SMT conversion event: saliency stats -> selection -> SMTPlan ->
sparse train state.

Mirrors reference fine_tune.py:257-401 (matrix) and :406-575 (channel),
executed once when step == full_ft_steps. Differences by design:

  * stats are reduced on device from the sharded accumulators and pulled
    to host as tiny (R/256, C/256) matrices; every host computes the same
    deterministic top-k (psum'd stats are replicated-identical), replacing
    both safe_get_full_grad and the filesystem index broadcast
    (deepspeed_helpers.py:177-200). A fingerprint assertion catches
    divergence (SURVEY.md §5.2).
  * quirk preserved: the reference omits calculate_strategy when selecting
    ATTENTION blocks/channels, so attention always uses the default
    "mean_abs" while MLP uses the configured strategy
    (fine_tune.py:306-313 vs :319-327, :472-477 vs :493-498).
  * deviation documented: with --no_limit_mixture the reference merges the
    dicts the wrong way round (`attention_warmup_grads.update(warmup_grads)`
    then selects over `warmup_grads`, fine_tune.py:270-277) so mixture mode
    effectively selects from MLP grads only. Here mixture selects over the
    union of attention+MLP stats with the combined budget — the evident
    intent of "without any limitation".
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import ATTN_TARGETS, MLP_TARGETS
from sparse_matrix_tuning_tpu.smt.plan import SMTPlan, parse_key
from sparse_matrix_tuning_tpu.smt.select import (
    block_stats, block_stats_final, channel_stats, count_total_blocks,
    num_selected_blocks, select_channels, select_submatrices,
)

ATTENTION_CALCULATE_STRATEGY = "mean_abs"  # reference default-arg quirk


def harvest_strategy(cfg: SMTConfig, module: str) -> str:
    """Per-module saliency reducer at harvest time: attention modules use
    the reference's default-arg mean_abs (fine_tune.py:306-313) unless
    no_limit_mixture merges the budgets (then everything uses the
    configured strategy). Shared by the unrolled/scan harvest steps and
    the per_step_stats finalization so they can never disagree."""
    return (cfg.calculate_strategy
            if (module not in ATTN_TARGETS or cfg.no_limit_mixture)
            else ATTENTION_CALCULATE_STRATEGY)

# every per-layer matmul that is frozen (or mostly frozen) after conversion
LAYER_LINEARS = ATTN_TARGETS + ("o_proj",) + MLP_TARGETS


def resolve_frozen_quant(cfg: SMTConfig, mode: str,
                         scan: bool = False) -> str:
    """frozen_quant="auto" -> int8 on TPU backends (measured ~1.7x on the
    sparse-phase matmuls at 8B widths, tools/int8_probe.py), exact bf16
    elsewhere. Channel mode supports int8 only in the SCAN path, where
    smt_channel_linear_dyn applies the exact selected-column correction
    (delta = cols - dequant cols); the unrolled channel forward computes
    through the scatter-updated dense weight and has no correction hook."""
    if mode == "channel" and not scan:
        return "none"
    if mode not in ("matrix", "channel"):
        return "none"
    if cfg.frozen_quant != "auto":
        return cfg.frozen_quant
    return "int8" if jax.devices()[0].platform == "tpu" else "none"


def resolve_head_quant(cfg: SMTConfig, model_cfg, frozen_quant: str) -> str:
    """head_quant="auto": int8 lm-head for the sparse-phase loss iff the
    frozen base is int8. Both loss paths consume it — the dense path runs
    frozen_q8_linear on the full logits, the chunked path runs the
    ops/loss.py chunked_causal_lm_loss_q8 int8-per-chunk online-LSE — so
    the resolve no longer depends on the loss policy (model_cfg is kept
    for signature stability)."""
    del model_cfg
    if cfg.head_quant != "auto":
        return cfg.head_quant
    return "int8" if frozen_quant == "int8" else "none"


def build_q_head(params, model_cfg) -> Dict:
    """Quantize the (frozen) lm-head weight once: {"wq" int8 (V, D),
    "sw" fp32 (V,)}. Tied models quantize the embedding matrix (the
    embedding LOOKUP keeps reading the bf16 copy)."""
    from sparse_matrix_tuning_tpu.models.llama import lm_head_weight
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    wq, sw = quantize_weight(lm_head_weight(params, model_cfg))
    return {"wq": wq, "sw": sw}


def build_qweights(layer_params, plan: SMTPlan) -> Dict:
    """Quantize every frozen layer linear once: {'{layer}.{module}':
    {"wq" int8 (O,I), "sw" fp32 (O,)[, "base" fp32 (n,256,256)]}}.

    "base" (planned linears only) holds the dequantized frozen values of
    the selected blocks, so the sparse linear can apply the exact
    correction delta = blocks - base (ops/sparse_linear.py q8 notes)."""
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight

    q: Dict = {}
    for li, layer in layer_params.items():
        for mod in LAYER_LINEARS:
            w = layer.get(mod)
            if w is None or getattr(w, "ndim", 0) != 2:
                continue
            ks = f"{li}.{mod}"
            wq, sw = quantize_weight(w)
            entry = {"wq": wq, "sw": sw}
            lp = plan.linears.get(ks)
            if lp is not None and plan.mode == "matrix":
                rb = jnp.asarray(lp.row_blocks())
                cb = jnp.asarray(lp.col_blocks())
                wq4 = wq.reshape(lp.out_dim // 256, 256, lp.in_dim // 256, 256)
                sw_rows = sw.reshape(lp.out_dim // 256, 256)[rb]  # (n, 256)
                entry["base"] = (wq4[rb, :, cb, :].astype(jnp.float32)
                                 * sw_rows[:, :, None])
            q[ks] = entry
    return q


def _split_stats(flat_stats: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """'{layer}.{module}' -> {(module, layer): stat}, split attn / mlp."""
    attn, mlp = {}, {}
    for ks, s in flat_stats.items():
        module, layer = parse_key(ks)
        (attn if module in ATTN_TARGETS else mlp)[(module, layer)] = s
    return attn, mlp


def compute_matrix_selection(cfg: SMTConfig, acc: Dict[str, jax.Array],
                             all_2d_shapes) -> Dict:
    """acc: fp32 grad-sum accumulators keyed '{layer}.{module}'."""
    total_blocks = count_total_blocks(all_2d_shapes)
    n_attn = num_selected_blocks(cfg.downsample_attention_blocks_ratio, total_blocks)
    n_mlp = num_selected_blocks(cfg.downsample_mlp_blocks_ratio, total_blocks)

    # device-side reduction to tiny per-block stats, then host top-k.
    # In per_step_stats mode the accumulators hold per-step stats reduced
    # with the per-module harvest strategy (incl. the attention mean_abs
    # quirk), so the strategy argument is moot there — only the
    # finalization (abs over the signed mean_abs running mean,
    # select.block_stats_final) remains.
    def stats_of(strategy):
        if cfg.saliency_accumulation == "per_step_stats":
            return {ks: np.asarray(block_stats_final(
                        g, harvest_strategy(cfg, parse_key(ks)[0])))
                    for ks, g in acc.items()}
        return {ks: np.asarray(jax.jit(block_stats, static_argnums=(1,))(g, strategy))
                for ks, g in acc.items()}

    def maybe_analyze(stats):
        if cfg.do_gradient_distribution_analysis and cfg.output_dir:
            from sparse_matrix_tuning_tpu.utils.analysis import (
                analyze_gradient_distribution)
            analyze_gradient_distribution(stats, cfg.output_dir)

    if cfg.no_limit_mixture:
        stats = stats_of(cfg.calculate_strategy)
        merged = {parse_key(ks): s for ks, s in stats.items()}
        maybe_analyze(merged)
        return select_submatrices(merged, n_attn + n_mlp, cfg.selection_strategy)

    selected: Dict = {}
    if n_attn > 0:
        attn_stats, _ = _split_stats(stats_of(ATTENTION_CALCULATE_STRATEGY))
        maybe_analyze(attn_stats)
        selected.update(select_submatrices(attn_stats, n_attn, cfg.selection_strategy))
    if n_mlp > 0:
        _, mlp_stats = _split_stats(stats_of(cfg.calculate_strategy))
        maybe_analyze(mlp_stats)
        selected.update(select_submatrices(mlp_stats, n_mlp, cfg.selection_strategy))
    return selected


def compute_channel_selection(cfg: SMTConfig, act_acc: Dict[str, jax.Array]) -> Dict:
    def stats_of(strategy):
        if cfg.saliency_accumulation == "per_step_stats":
            # accumulators already hold per-channel stats (reduced with the
            # per-module strategy at accumulation time)
            return {ks: np.asarray(a) for ks, a in act_acc.items()}
        return {ks: np.asarray(jax.jit(channel_stats, static_argnums=(1,))(a, strategy))
                for ks, a in act_acc.items()}

    if cfg.no_limit_mixture:
        stats = stats_of(cfg.calculate_strategy)
        merged = {parse_key(ks): s for ks, s in stats.items()}
        return select_channels(merged, cfg.num_attention_channel + cfg.num_mlp_channel,
                               cfg.selection_strategy)

    selected: Dict = {}
    if cfg.num_attention_channel > 0:
        attn_stats, _ = _split_stats(stats_of(ATTENTION_CALCULATE_STRATEGY))
        selected.update(select_channels(attn_stats, cfg.num_attention_channel,
                                        cfg.selection_strategy))
    if cfg.num_mlp_channel > 0:
        _, mlp_stats = _split_stats(stats_of(cfg.calculate_strategy))
        selected.update(select_channels(mlp_stats, cfg.num_mlp_channel,
                                        cfg.selection_strategy))
    return selected


def build_plan(cfg: SMTConfig, warmup_state: Dict, all_2d_shapes) -> SMTPlan:
    master = warmup_state["master"]
    dims = {}
    for li, layer in master["layers"].items():
        for mod in ATTN_TARGETS + MLP_TARGETS:
            dims[(mod, int(li))] = tuple(layer[mod].shape)

    if cfg.matrix_sparsity:
        selected = compute_matrix_selection(cfg, warmup_state["acc"], all_2d_shapes)
        plan = SMTPlan.from_selection("matrix", selected, dims)
    else:
        selected = compute_channel_selection(cfg, warmup_state["act_acc"])
        plan = SMTPlan.from_selection("channel", selected, dims)

    _assert_cross_host_agreement(plan)
    return plan


def _assert_cross_host_agreement(plan: SMTPlan):
    """All hosts must have computed an identical plan before converting
    (replaces the reference's file-broadcast + print-diff debugging,
    fine_tune.py:481-510)."""
    import jax
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    fp = np.frombuffer(bytes.fromhex(plan.fingerprint()[:16]), dtype=np.uint8)
    multihost_utils.assert_equal(fp, "SMT selection plans diverged across hosts")


def convert(cfg: SMTConfig, warmup_state: Dict, all_2d_shapes,
            model_cfg=None, scan: bool = False) -> Tuple[SMTPlan, Dict]:
    """Run selection and build the phase-2 state. The warm-up optimizer
    state, master copies and accumulators are dropped (reference deletes
    optimizer/scheduler/grad dicts, fine_tune.py:352-358).

    scan=True builds the stacked scan-over-layers state instead
    (train/scan_phase.py; requires model_cfg)."""
    from sparse_matrix_tuning_tpu.train.steps import init_sparse_state

    plan = build_plan(cfg, warmup_state, all_2d_shapes)
    if not plan.linears:
        raise ValueError(
            "SMT selection produced zero trainable blocks/channels — the "
            "downsample ratios are too small for this model's block count "
            "(the denominator counts ALL 2-D params, fine_tune.py:231-241).")
    if scan:
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            build_scan_sparse_state)
        return plan, build_scan_sparse_state(cfg, warmup_state, plan,
                                             model_cfg)
    master = warmup_state["master"]
    params = jax.tree.map(lambda p: p.astype(cfg.param_dtype), master)
    trainable = plan.gather(master["layers"], dtype=jnp.float32)
    state = init_sparse_state(params, trainable, step=int(warmup_state["step"]),
                              cfg=cfg)
    fq = resolve_frozen_quant(cfg, plan.mode, scan=False)
    if fq == "int8":
        # quantize from the fp32 master (best rounding); wq/sw/base are
        # frozen constants that ride along in the state pytree
        state["q"] = build_qweights(master["layers"], plan)
    # NOT nested under fq == "int8": an explicit --head_quant int8 works
    # over a bf16 frozen base too (the head path is independent)
    if (model_cfg is not None
            and resolve_head_quant(cfg, model_cfg, fq) == "int8"):
        state["q_head"] = build_q_head(master, model_cfg)
    return plan, state


class HostShards:
    """Per-process host store of a globally-sharded array: each process
    keeps ONLY its addressable shards in host RAM (multi-process frozen
    host offload, VERDICT r4 next #7 — at 70B/8-way this is what removes
    ~17.5 GB of compute-dead bf16 weights per device without any host
    holding the full tensor). `restore()` reassembles the global sharded
    jax.Array on its original devices (transient HBM = one module's
    per-device shard) for export/checkpoint gathers.

    Reference analogue: ZeRO CPU offload keeps each rank's partition in
    host RAM (deepspeed_helpers.py:62-75)."""

    def __init__(self, arr: jax.Array):
        self.shape = tuple(arr.shape)
        self.dtype = arr.dtype
        self.sharding = arr.sharding
        self.shards = {}
        for s in arr.addressable_shards:
            key = self._key(s.index)
            if key not in self.shards:  # replicas hold identical data
                self.shards[key] = np.asarray(s.data)

    def _key(self, index):
        return tuple((sl.start or 0,
                      sl.stop if sl.stop is not None else dim)
                     for sl, dim in zip(index, self.shape))

    @property
    def size(self) -> int:
        return int(np.prod(self.shape))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def restore(self) -> jax.Array:
        return jax.make_array_from_callback(
            self.shape, self.sharding,
            lambda idx: self.shards[self._key(idx)])


def host_frozen_global(entry) -> np.ndarray:
    """Full host value of a host-frozen store entry — plain np passes
    through; HostShards reassembles on device and allgathers (collective:
    every process must call this)."""
    if isinstance(entry, HostShards):
        from sparse_matrix_tuning_tpu.train.scan_phase import _host_global
        return _host_global(entry.restore())
    return np.asarray(entry)


def frozen_offload_active(cfg: SMTConfig, mode: str, mesh,
                          scan: bool = False) -> bool:
    """int8 frozen base: the bf16 dense layer weights are dead in
    sparse-phase compute (planned linears run through wq/sw/base with the
    exact block/column correction, frozen ones through wq/sw), so they
    move to HOST memory and HBM holds only the int8 copy.

    Single process/device: the whole tensor moves (np array). On meshes,
    the SCAN layout offloads too — each process keeps its addressable
    shards (HostShards above), cutting the 70B 8-way per-device peak by
    the stacked bf16 footprint. The unrolled layout stays device-resident
    on meshes (shallow models — the per-chip cost is small and not worth
    the extra machinery)."""
    if not (cfg.frozen_host_offload
            and resolve_frozen_quant(cfg, mode, scan=scan) == "int8"):
        return False
    if mesh is None and jax.process_count() == 1:
        return True
    return scan


def _to_host_store(w):
    """np array for addressable arrays; HostShards when shards span other
    processes (each process keeps only what it owns)."""
    if isinstance(w, jax.Array) and not w.is_fully_addressable:
        return HostShards(w)
    return np.asarray(w)


def offload_lm_head(params: Dict, host: Dict, keep_host: bool) -> Dict:
    """Move the compute-dead untied bf16 lm_head into `host` under the
    key "lm_head", returning a params dict with a 1-element placeholder.
    Only meaningful with an int8 head (q_head carries the compute); no-op
    for tied models (embed_tokens must stay for the embedding lookup) or
    when already offloaded. Consumers of the host key:
    trainer._merged_from_host and scan_phase.merged_params_from_scan."""
    if getattr(params.get("lm_head"), "ndim", 0) != 2:
        return params
    params = dict(params)
    if keep_host:
        host["lm_head"] = _to_host_store(params["lm_head"])
    params["lm_head"] = jnp.zeros((1,), params["lm_head"].dtype)
    return params


def offload_frozen_to_host(state: Dict,
                           keep_host: bool = True
                           ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Move every quantized dense layer weight (the keys of state["q"]) to
    host numpy, leaving a zero-size placeholder on device so the state
    pytree keeps its structure. Returns (new_state, host_store).

    The sparse step then skips the per-step block scatter (plan.scatter
    no-ops on placeholders) and HF export reconstructs the dense weights on
    host (trainer.merged_params). ~2 bytes/param of HBM freed — the
    difference between the bench's 36% and 24% live-HBM-vs-full-FT ratio.
    No reference analogue: the reference's frozen weights stay in HBM as
    the forward operand (smt.py:366)."""
    host: Dict[str, np.ndarray] = {}
    new_layers = {k: dict(v) for k, v in state["params"]["layers"].items()}
    for ks in state["q"]:
        li, mod = ks.split(".", 1)
        w = new_layers[li][mod]
        if keep_host:  # False = caller never exports (throughput benches)
            host[ks] = np.asarray(w)
        # 1-element (not 0-size: orbax refuses those) placeholder keeps the
        # pytree structure for checkpoints and the model's lp[name] access
        new_layers[li][mod] = jnp.zeros((1,), w.dtype)
    new_params = dict(state["params"])
    new_params["layers"] = new_layers
    if "q_head" in state:
        # int8 head (head_quant): the untied bf16 lm_head is compute-dead
        # too — both loss paths read q_head
        new_params = offload_lm_head(new_params, host, keep_host)
    new_state = dict(state)
    new_state["params"] = new_params
    return new_state, host
