"""Two-phase SMT trainer — the orchestration layer.

Replaces reference deepspeed/fine_tune.py:72-864 (`trainer`): epoch loop,
warm-up, the one-shot conversion event, eval/save cadences, throughput
prints. The DeepSpeed engine rebuild at conversion (fine_tune.py:379-384)
becomes a clean phase switch: a new train-state pytree and a second jitted
step function.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, all_2d_param_shapes
from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule
from sparse_matrix_tuning_tpu.smt.plan import SMTPlan
from sparse_matrix_tuning_tpu.train import convert as convert_mod
from sparse_matrix_tuning_tpu.train.steps import (
    build_channel_warmup_step, build_eval_step, build_sparse_step,
    build_warmup_step, init_warmup_state,
)
from sparse_matrix_tuning_tpu.utils.logging import print_rank_0
from sparse_matrix_tuning_tpu.utils.throughput import ThroughputReporter


class SMTTrainer:
    """Drives warm-up -> selection/conversion -> sparse fine-tuning.

    params: initial model params (any float dtype; promoted to fp32 master).
    total_steps: optimizer-step horizon for the LR schedule
    (num_ft_epochs * steps_per_epoch, reference fine_tune.py:175-183).
    """

    def __init__(self, cfg: SMTConfig, model_cfg: LlamaConfig, params,
                 total_steps: int, mesh=None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.total_steps = int(total_steps)
        self.mesh = mesh
        self.plan: Optional[SMTPlan] = None
        self.phase = "warmup"
        self._all_2d_shapes = all_2d_param_shapes(params)
        # host-RAM store of the frozen bf16 dense weights when the int8
        # sparse phase offloads them (train/convert.py frozen_offload_active)
        self._host_frozen: Optional[Dict[str, np.ndarray]] = None
        # sparse phase runs scan-over-layers (train/scan_phase.py)
        self._scan = False

        from sparse_matrix_tuning_tpu.parallel.mesh import (
            is_cpu_3d_hazard, set_compute_mesh)
        if (mesh is not None and cfg.attn_impl == "fullk"
                and is_cpu_3d_hazard(mesh)):
            raise ValueError(
                f"attn_impl=fullk on CPU mesh {tuple(mesh.devices.shape)}: "
                "XLA CPU GSPMD miscompiles full-model programs that embed a "
                "shard_map region on all-axes>1 3D CPU meshes (silent ~3e-3 "
                "step-1 loss error — see parallel.mesh.is_cpu_3d_hazard). "
                "Use a factorization with a size-1 axis ((1,N,1), (2,N/2,1), "
                "(1,N/2,2) are verified clean) or attn_impl=einsum. TPU "
                "meshes are unaffected.")
        set_compute_mesh(mesh)  # shard_map-wrapped kernels read this at trace

        from sparse_matrix_tuning_tpu.train.scan_phase import (
            build_scan_warmup_step, init_scan_warmup_state,
            resolve_scan_warmup)
        from sparse_matrix_tuning_tpu.train.steps import (
            resolve_saliency_accumulation)
        resolve_saliency_accumulation(cfg, params)
        self._scan_warmup = resolve_scan_warmup(cfg, model_cfg)
        if self._scan_warmup:
            self.state = init_scan_warmup_state(params, cfg, model_cfg)
        else:
            self.state = init_warmup_state(params, cfg)
        self._place_state(plan_mode=None)

        warmup_sched = make_lr_schedule(cfg.lr_scheduler_type, cfg.ft_learning_rate,
                                        cfg.lr_warmup_steps, self.total_steps)
        if self._scan_warmup == "matrix":
            self._warmup_step = self._jit(
                build_scan_warmup_step(cfg, model_cfg, warmup_sched))
        elif self._scan_warmup == "channel":
            # pure-channel warm-up never trains (every pre-conversion step
            # routes to _channel_step below), so there is no full-FT step —
            # and the channel scan state carries no adam state to feed one
            self._warmup_step = None
        else:
            self._warmup_step = self._jit(
                build_warmup_step(cfg, model_cfg, warmup_sched))
        self._channel_step = None
        if cfg.channel_sparsity:
            from sparse_matrix_tuning_tpu.train.scan_phase import (
                build_scan_channel_warmup_step)
            builder = (build_scan_channel_warmup_step
                       if self._scan_warmup == "channel"
                       else build_channel_warmup_step)
            self._channel_step = self._jit(builder(cfg, model_cfg))
        self._sparse_step = None  # built at conversion
        self._eval_step = self._jit_eval(build_eval_step(cfg, model_cfg))

        self.history: Dict[str, list] = {"train_loss": [], "eval_loss": [], "ppl": []}
        self.best_eval_loss = float("inf")
        self.reporter: Optional[ThroughputReporter] = None

    @classmethod
    def sparse_scan_from_hf(cls, cfg: SMTConfig, model_dir: str, plan: SMTPlan,
                            total_steps: int, model_cfg=None):
        """Sparse-ONLY trainer via quantize-on-load (scan_phase.
        build_scan_state_from_hf): warm-up + selection ran elsewhere (e.g.
        a sharded pod) and produced `plan`; the sparse phase continues
        from the base checkpoint on hardware the full-precision model
        cannot fit — full weights never co-reside on device. Single-
        process/single-device (the regime that needs it).

        The reference has no analogue: its sparse phase always starts from
        the in-memory warm-up model (fine_tune.py:257-401)."""
        from sparse_matrix_tuning_tpu.models.hf_io import load_hf_config
        from sparse_matrix_tuning_tpu.parallel.mesh import set_compute_mesh
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            build_scan_state_from_hf)

        model_cfg = model_cfg or load_hf_config(model_dir)
        if plan.mode not in ("matrix", "channel") or cfg.dtype == "fp16":
            raise ValueError("sparse_scan_from_hf requires matrix or "
                             "channel mode and dtype != fp16 (the fp16 "
                             "loss-scale state is created by the warm-up "
                             "phase, which this entry skips)")

        self = cls.__new__(cls)
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.total_steps = int(total_steps)
        self.mesh = None
        self.plan = plan
        self.phase = "sparse"
        self._scan = True
        self._scan_warmup = False
        self._all_2d_shapes = None
        self._warmup_step = None
        self._channel_step = None
        self.history = {"train_loss": [], "eval_loss": [], "ppl": []}
        self.best_eval_loss = float("inf")
        self.reporter = None
        set_compute_mesh(None)
        self.state, self._host_frozen = build_scan_state_from_hf(
            cfg, model_dir, plan, model_cfg)
        self.install_sparse_phase()
        return self

    # -- jit / sharding helpers ------------------------------------------------

    def _jit(self, fn):
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=(0,))
        if jax.process_count() == 1:
            # Single process: pass the host batch straight into jit and
            # constrain it to the batch sharding INSIDE the traced fn.
            # (Committing the batch to NamedSharding(mesh, batch_pspec())
            # before the call is numerically WRONG on the CPU backend with a
            # 3D mesh: GSPMD propagation mis-reshards one operand of the
            # first residual add, swapping (data, fsdp) shard groups —
            # reproduced on jax 0.8.x with 8 virtual CPU devices, mesh
            # (2,2,2); the in-jit constraint form compiles correctly.)
            from sparse_matrix_tuning_tpu.parallel.mesh import batch_pspec
            from jax.sharding import NamedSharding
            batch_sh = NamedSharding(self.mesh, batch_pspec())

            def wrapped(state, batch):
                batch = jax.device_put(batch, {k: batch_sh for k in batch})
                return fn(state, batch)

            return jax.jit(wrapped, donate_argnums=(0,))

        jfn = jax.jit(fn, donate_argnums=(0,))

        def wrapped(state, batch):
            return jfn(state, self._globalize_batch(batch))

        return wrapped

    def _jit_eval(self, fn):
        """Like _jit but without state donation (eval keeps the state)."""
        if self.mesh is None or jax.process_count() > 1:
            jfn = jax.jit(fn)
            if self.mesh is None:
                return jfn
            return lambda state, batch: jfn(state, self._globalize_batch(batch))
        from sparse_matrix_tuning_tpu.parallel.mesh import batch_pspec
        from jax.sharding import NamedSharding
        batch_sh = NamedSharding(self.mesh, batch_pspec())

        def wrapped(state, batch):
            batch = jax.device_put(batch, {k: batch_sh for k in batch})
            return fn(state, batch)

        return jax.jit(wrapped)

    def _globalize_batch(self, batch):
        """Host numpy batch -> global sharded arrays over the mesh
        (multi-process path).

        Every process builds the identical global batch (the batch iterator
        is deterministic in (seed, epoch)), so each process hands XLA the
        rows its addressable devices own — correct on a real multi-host pod,
        where a whole-batch device_put would touch non-addressable devices
        (the reference's DistributedSampler equivalent, fine_tune.py:133-147).
        """
        from sparse_matrix_tuning_tpu.parallel.mesh import batch_pspec
        from jax.sharding import NamedSharding
        sh = NamedSharding(self.mesh, batch_pspec())
        if jax.process_count() == 1:
            return jax.device_put(batch, {k: sh for k in batch})
        return {
            k: jax.make_array_from_callback(v.shape, sh, lambda idx, v=v: v[idx])
            for k, v in batch.items()
        }

    def _place_state(self, plan_mode):
        if self.mesh is None:
            return
        from sparse_matrix_tuning_tpu.parallel.mesh import state_shardings
        sh = state_shardings(self.state, self.mesh, plan_mode)
        self.state = jax.device_put(self.state, sh)

    # -- conversion ---------------------------------------------------------------

    @property
    def step(self) -> int:
        return int(self.state["step"])

    @property
    def is_smt(self) -> bool:
        return self.cfg.matrix_sparsity or self.cfg.channel_sparsity

    def maybe_convert(self):
        if self.phase != "warmup" or not self.is_smt:
            return
        if self.step < self.cfg.full_ft_steps:
            return
        t0 = time.time()
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            convert_from_scan_warmup, offload_scan_frozen_to_host,
            resolve_scan_layers)
        mode = "matrix" if self.cfg.matrix_sparsity else "channel"
        self._scan = resolve_scan_layers(self.cfg, self.model_cfg, mode)
        if self._scan_warmup:
            # scan warm-up implies scan sparse phase (same conditions)
            self._scan = True
            self.plan, self.state = convert_from_scan_warmup(
                self.cfg, self.state, self.model_cfg, self._all_2d_shapes)
        else:
            self.plan, self.state = convert_mod.convert(
                self.cfg, self.state, self._all_2d_shapes,
                model_cfg=self.model_cfg, scan=self._scan)
        if convert_mod.frozen_offload_active(self.cfg, self.plan.mode,
                                             self.mesh, scan=self._scan):
            if self._scan:
                self.state, self._host_frozen = \
                    offload_scan_frozen_to_host(self.state)
            else:
                self.state, self._host_frozen = \
                    convert_mod.offload_frozen_to_host(self.state)
        self._place_state(plan_mode=self.plan.mode)
        self.install_sparse_phase()

        total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state["params"]))
        total += sum(v.size for v in (self._host_frozen or {}).values())
        sel = self.plan.trainable_params
        print_rank_0(
            f"[smt] converted at step {self.step} in {time.time() - t0:.1f}s: "
            f"{len(self.plan.linears)} linears, {sel:,} trainable "
            f"({100.0 * sel / total:.3f}% of {total:,})")

    def install_sparse_phase(self):
        """Switch to phase 2: build the jitted sparse step (LR schedule over
        the remaining horizon at smt_lr — reference fine_tune.py:366-372,
        with the group-lr-overrides-constructor-lr quirk, smt.py:506-519)."""
        self.phase = "sparse"
        # schedule horizon counts from the conversion step (reference
        # fine_tune.py:366-372); recover it as step - sparse-update-count so
        # this also holds when restoring a mid-sparse-phase checkpoint
        conversion_step = self.step - int(self.state["count"])
        sparse_sched = make_lr_schedule(
            self.cfg.lr_scheduler_type, self.cfg.smt_lr,
            self.cfg.smt_lr_warmup_steps,
            max(self.total_steps - conversion_step, 1))
        if self._scan:
            from sparse_matrix_tuning_tpu.train.scan_phase import (
                build_scan_eval_step, build_scan_sparse_step)
            self._sparse_step = self._jit(build_scan_sparse_step(
                self.cfg, self.model_cfg, self.plan, sparse_sched))
            self._eval_step = self._jit_eval(build_scan_eval_step(
                self.cfg, self.model_cfg, self.plan))
            return
        self._sparse_step = self._jit(
            build_sparse_step(self.cfg, self.model_cfg, self.plan, sparse_sched))
        if self._host_frozen is not None:
            # dense weights left the device: eval-loss must run the same
            # q8-corrected dispatch as the training forward
            self._eval_step = self._jit_eval(
                build_eval_step(self.cfg, self.model_cfg, plan=self.plan))

    # -- steps ------------------------------------------------------------------------

    def _check_right_padding(self, batch):
        """One-time (per trainer) invariant check: the fused attention
        kernels (fullk/flash) ignore the attention mask and are only
        correct for causal + RIGHT-padded batches (models/llama.py
        _decoder_layer dispatch). The data pipeline right-pads by
        construction; a future left-padded or packed-sequence batch must
        fail loudly here rather than train on silently wrong attention."""
        if getattr(self, "_padding_checked", False):
            return
        self._padding_checked = True
        mask = batch.get("attention_mask")
        if mask is None:
            return
        from sparse_matrix_tuning_tpu.models.llama import resolve_attn_impl
        seq = int(np.asarray(batch["input_ids"]).shape[-1])
        if resolve_attn_impl(self.cfg.attn_impl, seq,
                             self.model_cfg.head_dim) == "einsum":
            return
        m = np.asarray(mask)
        if not (m[:, :-1] >= m[:, 1:]).all():
            raise ValueError(
                "batch attention_mask is not right-padded (monotone non-"
                "increasing rows); the fused attention kernels require "
                "right padding — use attn_impl='einsum' for left-padded "
                "or packed batches")

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """One global-batch step, dispatching on phase (reference loop body
        fine_tune.py:248-844)."""
        from sparse_matrix_tuning_tpu.parallel.mesh import set_compute_mesh
        set_compute_mesh(self.mesh)  # jit traces lazily, on the first call
        self._check_right_padding(batch)
        self.maybe_convert()
        if self.phase == "sparse":
            self.state, metrics = self._sparse_step(self.state, batch)
        elif self.cfg.channel_sparsity and self.step < self.cfg.full_ft_steps:
            # channel warm-up: collect activations, do NOT train
            self.state, metrics = self._channel_step(self.state, batch)
        else:
            self.state, metrics = self._warmup_step(self.state, batch)
        return metrics

    def evaluate(self, eval_batches: Iterable[Dict[str, np.ndarray]]):
        """Mean eval loss + perplexity (reference helper.py:210-245).

        Every process evaluates the same global batches (sharded over the
        whole mesh), so the jit output is replicated-identical across hosts
        — the global mean, with no explicit all-reduce needed (the
        reference instead shards eval data per rank and get_all_reduce_means
        the result, deepspeed_helpers.py:409-412)."""
        from sparse_matrix_tuning_tpu.parallel.mesh import set_compute_mesh
        set_compute_mesh(self.mesh)
        losses = []
        for batch in eval_batches:
            losses.append(self._eval_step(self.state, batch))
        if not losses:
            return float("inf"), float("inf")
        loss = float(jnp.mean(jnp.stack(losses)))
        return float(np.exp(min(loss, 80.0))), loss

    # -- full training loop ------------------------------------------------------------

    def fit(self, train_ds, eval_ds, pad_token_id: int,
            tokenizer=None, on_metrics=None) -> Dict[str, list]:
        from sparse_matrix_tuning_tpu.data import native
        from sparse_matrix_tuning_tpu.data.sft import batch_iterator, num_batches

        cfg = self.cfg
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        # effective batch = per-device x devices x accumulation
        # (reference fine_tune.py:96-102); accumulation happens inside the
        # jitted step (steps.accumulated_value_and_grad)
        global_bs = (cfg.per_device_ft_batch_size * n_dev
                     * cfg.gradient_accumulation_steps)
        eval_bs = cfg.per_device_eval_batch_size * n_dev
        steps_per_epoch = num_batches(len(train_ds), global_bs)

        self.reporter = ThroughputReporter(
            batch_size=global_bs, seq_length=cfg.max_seq_len,
            num_layers=self.model_cfg.num_hidden_layers,
            hidden_size=self.model_cfg.hidden_size,
            vocab_size=self.model_cfg.vocab_size,
            num_devices=n_dev, every=cfg.throughput_steps)

        def eval_batches():
            return batch_iterator(eval_ds, eval_bs, pad_token_id,
                                  cfg.seq_buckets, cfg.seed, 0,
                                  shuffle=False, drop_last=False)

        # training batches: C++ arena collation + background prefetch when
        # the native extension builds; numpy fallback otherwise
        if native.native_available() and len(train_ds):
            arena = native.TokenArena.from_dataset(train_ds)

            def train_batches(epoch):
                return native.PrefetchLoader(
                    lambda: native.native_batch_iterator(
                        arena, global_bs, pad_token_id, cfg.seq_buckets,
                        cfg.seed, epoch))
        else:
            def train_batches(epoch):
                return batch_iterator(train_ds, global_bs, pad_token_id,
                                      cfg.seq_buckets, cfg.seed, epoch)

        # resume support: skip epochs/batches already consumed (the batch
        # order is deterministic in (seed, epoch), so replay is exact)
        start_epoch = min(self.step // steps_per_epoch, cfg.num_ft_epochs)
        skip_in_epoch = self.step % steps_per_epoch if start_epoch < cfg.num_ft_epochs else 0

        stop = False
        for epoch in range(start_epoch, cfg.num_ft_epochs):
            print_rank_0(f"Beginning of Epoch {epoch + 1}/{cfg.num_ft_epochs}, "
                         f"Total Micro Batches {steps_per_epoch}")
            mean_loss, n_steps = 0.0, 0
            to_skip, skip_in_epoch = skip_in_epoch, 0
            for bi, batch in enumerate(train_batches(epoch)):
                if bi < to_skip:
                    continue
                self._maybe_profile()
                metrics = self.train_step(batch)
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    if metrics.get("overflow") is not None and bool(metrics["overflow"]):
                        # fp16 dynamic loss scaling: overflow steps are
                        # skipped+rescaled, not fatal (DeepSpeed semantics)
                        print_rank_0(
                            f"[fp16] overflow at step {self.step}, loss scale "
                            f"-> {float(metrics['loss_scale']) / 2:.0f}")
                        continue
                    # explicit NaN guard (the reference has no sanitizers,
                    # SURVEY.md §5.2 — a NaN there silently poisons the run)
                    raise FloatingPointError(
                        f"non-finite training loss at step {self.step} "
                        f"(phase {self.phase}); last grad_norm="
                        f"{float(metrics.get('grad_norm', float('nan')))}")
                mean_loss += loss
                n_steps += 1
                self.history["train_loss"].append(loss)
                step = self.step
                self._log_metrics(step, metrics)

                rep = self.reporter.maybe_report(step)
                if rep:
                    print_rank_0({"throughput": rep})
                if step % cfg.log_steps == 0:
                    print_rank_0(f"step {step} loss {loss:.4f} lr "
                                 f"{float(metrics.get('lr', 0)):.3e} phase {self.phase}")
                if on_metrics:
                    on_metrics(step, metrics)

                if cfg.eval_step > 0 and step % cfg.eval_step == 0:
                    ppl, eval_loss = self.evaluate(eval_batches())
                    self.history["eval_loss"].append(eval_loss)
                    self.history["ppl"].append(ppl)
                    print_rank_0(f"Validation perplexity: {ppl}, "
                                 f"Validation loss: {eval_loss}")
                    if eval_loss < self.best_eval_loss:
                        self.best_eval_loss = eval_loss
                        self._save("best", tokenizer)

                if cfg.save_steps > 0 and step % cfg.save_steps == 0:
                    self._save(f"step_{step}", tokenizer)
                    self._save_resumable()

                if cfg.early_terminate and step > 0 and step % 3000 == 0:
                    stop = True
                    break
            if n_steps:
                print_rank_0(f"epoch {epoch + 1}/{cfg.num_ft_epochs} with "
                             f"training loss: {mean_loss / n_steps}")
            self._save(f"epoch_{epoch + 1}", tokenizer)
            self._save_resumable()
            if stop:
                break

        ppl, eval_loss = self.evaluate(eval_batches())
        self.history["eval_loss"].append(eval_loss)
        self.history["ppl"].append(ppl)
        self._save("final", tokenizer)
        return self.history

    # -- export -----------------------------------------------------------------------

    def merged_params(self):
        """Dense params with current trainables merged (reference
        convert_matrix_sparsity_to_linear_layer, smt.py:416-457). In the
        sparse phase the dense weights are already current; in warm-up the
        master is the truth. With the int8 host offload the frozen bf16
        weights are reconstructed on host and the trained blocks scattered
        in — export is exact, independent of the int8 compute path."""
        if self.phase == "sparse":
            if self._scan:
                from sparse_matrix_tuning_tpu.train.scan_phase import (
                    merged_params_from_scan)
                return merged_params_from_scan(self.state, self.plan,
                                               self.model_cfg,
                                               self._host_frozen)
            if self._host_frozen is not None:
                return self._merged_from_host()
            return self.state["params"]
        master = self.state["master"]
        if "layers_stacked" in master:  # scan warm-up: unstack for export
            dt = self.cfg.param_dtype
            out = {k: v.astype(dt) for k, v in master.items()
                   if k != "layers_stacked"}
            out["layers"] = {
                str(l): {mod: w[l].astype(dt)
                         for mod, w in master["layers_stacked"].items()}
                for l in range(self.model_cfg.num_hidden_layers)
            }
            return out
        return jax.tree.map(lambda p: p.astype(self.cfg.param_dtype), master)

    def decode_params(self):
        """Params for eval/generate.generate. Scan+int8 trainers decode
        straight from the int8 training state — no bf16 dense
        materialization, which is what lets a model whose dense weights
        exceed the chip (the 8B-on-16G regime) run its generation eval in
        place (eval/generate.decode_params_from_scan). Everything else
        decodes from the exact merged dense params."""
        from sparse_matrix_tuning_tpu.eval.generate import (
            decode_params_from_scan, prepare_decode_params)
        if self.phase == "sparse" and self._scan and "q" in self.state:
            return decode_params_from_scan(self.state, self.model_cfg,
                                           self._host_frozen)
        return prepare_decode_params(self.merged_params(), self.model_cfg)

    def _merged_from_host(self):
        from sparse_matrix_tuning_tpu.smt.plan import BLOCK
        params = jax.tree.map(np.asarray, self.state["params"])
        layers = {k: dict(v) for k, v in params["layers"].items()}
        for ks, w in self._host_frozen.items():
            if ks == "lm_head":  # offloaded untied head (head_quant)
                params["lm_head"] = w
                continue
            li, mod = ks.split(".", 1)
            layers[li][mod] = w
        for ks, lp in self.plan.linears.items():
            w = layers[str(lp.layer)][lp.module].copy()
            t = np.asarray(self.state["trainable"][ks]).astype(w.dtype)
            w4 = w.reshape(lp.out_dim // BLOCK, BLOCK, lp.in_dim // BLOCK, BLOCK)
            rb = np.asarray(lp.row_blocks())
            cb = np.asarray(lp.col_blocks())
            w4[rb, :, cb, :] = t
            layers[str(lp.layer)][lp.module] = w
        params = dict(params)
        params["layers"] = layers
        return params

    def _maybe_profile(self):
        """jax.profiler device trace of a few steady-state steps
        (--profile_dir; SURVEY §5.1)."""
        cfg = self.cfg
        if not cfg.profile_dir:
            return
        if self.step == cfg.profile_start and not getattr(self, "_profiling", False):
            jax.profiler.start_trace(cfg.profile_dir)
            self._profiling = True
            print_rank_0(f"[profile] tracing steps {cfg.profile_start}.."
                         f"{cfg.profile_start + cfg.profile_steps} -> {cfg.profile_dir}")
        elif getattr(self, "_profiling", False) and \
                self.step >= cfg.profile_start + cfg.profile_steps:
            jax.block_until_ready(jax.tree.leaves(self.state)[0])
            jax.profiler.stop_trace()
            self._profiling = False

    def _save_resumable(self):
        """Orbax full-state checkpoint at {output_dir}/ckpt — what
        --resume_from consumes (the HF-format saves are weights-only)."""
        if not self.cfg.output_dir:
            return
        from sparse_matrix_tuning_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(os.path.join(self.cfg.output_dir, "ckpt"), self)

    def _log_metrics(self, step: int, metrics: Dict):
        """Structured metrics stream (replaces the reference's disabled
        tensorboard block, deepspeed_helpers.py:98-102): one JSON line per
        step into {output_dir}/metrics.jsonl."""
        if not self.cfg.output_dir or jax.process_index() != 0:
            return
        import json
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        rec = {"step": step, "phase": self.phase,
               **{k: float(v) for k, v in metrics.items()}}
        with open(os.path.join(self.cfg.output_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _save(self, tag: str, tokenizer=None):
        if not self.cfg.output_dir:
            return
        from sparse_matrix_tuning_tpu.models.hf_io import save_hf_format
        params = self.merged_params()
        if jax.process_count() > 1:
            # collective: multi-host shards are not addressable from process
            # 0, so EVERY process gathers before rank 0 writes (reference
            # rank-0 save_hf_format, deepspeed_helpers.py:341-364).
            # Per-leaf and jax-Arrays only: the scan/offload merge paths
            # already return host numpy (gathered inside
            # merged_params_from_scan) — allgathering numpy again would
            # wrongly concatenate identical per-host copies.
            from sparse_matrix_tuning_tpu.train.scan_phase import _host_global
            params = jax.tree.map(_host_global, params)
        if jax.process_index() != 0:
            return
        out = os.path.join(self.cfg.output_dir, tag)
        save_hf_format(params, self.model_cfg, out, tokenizer)
        if self.plan is not None:
            with open(os.path.join(out, "smt_plan.json"), "w") as f:
                f.write(self.plan.to_json())
        print_rank_0(f"[save] {out}")
