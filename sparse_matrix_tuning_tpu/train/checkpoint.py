"""Orbax checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md §5.4: reference saves are HF-format weights only; optimizer/
scheduler/step state is lost on crash, resume is unsupported).

A checkpoint records the full train-state pytree, the SMT plan (if
converted), the phase, and the config — so an SMT run can resume mid
warm-up (with its saliency accumulators) or mid sparse phase.
"""

from __future__ import annotations

import json
import os

import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _save_host_frozen(path: str, host) -> None:
    """npz sidecar for the host-offloaded frozen bf16 weights (bf16 has no
    native numpy dtype support in npz — stored as a uint16 view)."""
    import ml_dtypes
    import numpy as np
    np.savez(os.path.join(path, "frozen_host.npz"),
             **{k: (v.view(np.uint16) if v.dtype == ml_dtypes.bfloat16 else v)
                for k, v in host.items()})


def _load_host_frozen(path: str):
    import ml_dtypes
    import numpy as np
    f = os.path.join(path, "frozen_host.npz")
    if not os.path.exists(f):
        return None
    with np.load(f) as z:
        # no model weight is genuinely uint16, so uint16 == viewed bf16
        return {k: (z[k].view(ml_dtypes.bfloat16)
                    if z[k].dtype == np.uint16 else z[k])
                for k in z.files}


def save_checkpoint(path: str, trainer) -> None:
    """trainer: SMTTrainer. Writes {path}/state, plan.json, meta.json.

    The Orbax save of multi-host sharded arrays is a COLLECTIVE — every
    process must call it (process 0 alone cannot serialize non-addressable
    shards); only the small JSON sidecars are gated on process 0."""
    os.makedirs(path, exist_ok=True)
    _ckptr().save(os.path.join(os.path.abspath(path), "state"), trainer.state,
                  force=True)
    host = getattr(trainer, "_host_frozen", None)
    if host is not None:
        from sparse_matrix_tuning_tpu.train.convert import (
            HostShards, host_frozen_global)
        if any(isinstance(v, HostShards) for v in host.values()):
            # multi-process offload: reassembling is a COLLECTIVE — every
            # process participates before the rank-0 gate
            host = {k: host_frozen_global(v) for k, v in host.items()}
    if jax.process_index() != 0:
        return
    if host is not None:
        _save_host_frozen(path, host)
    meta = {"phase": trainer.phase, "step": trainer.step,
            "total_steps": trainer.total_steps,
            "best_eval_loss": trainer.best_eval_loss}
    if trainer.phase == "sparse" and trainer.plan is not None:
        # record the RESOLVED sparse-phase layout so a restore under
        # different flags/backend fails with an actionable message instead
        # of a deep orbax structure mismatch (e.g. frozen_quant=auto written
        # on TPU restored on CPU, or --scan_layers toggled)
        from sparse_matrix_tuning_tpu.train.convert import resolve_frozen_quant
        meta["resolved"] = {
            "scan": bool(getattr(trainer, "_scan", False)),
            "host_offload": getattr(trainer, "_host_frozen", None) is not None,
            "frozen_quant": resolve_frozen_quant(
                trainer.cfg, trainer.plan.mode,
                scan=bool(getattr(trainer, "_scan", False))),
        }
        # head_quant presence changes the state structure too (q_head leaf)
        meta["resolved"]["head_quant"] = (
            "int8" if "q_head" in trainer.state else "none")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(trainer.cfg.to_json())
    if trainer.plan is not None:
        with open(os.path.join(path, "plan.json"), "w") as f:
            f.write(trainer.plan.to_json())


def restore_checkpoint(path: str, trainer) -> None:
    """Restore state/phase/plan into an SMTTrainer constructed with the same
    config+model. Rebuilds the sparse step function if needed."""
    from sparse_matrix_tuning_tpu.smt.plan import SMTPlan

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    plan = None
    plan_file = os.path.join(path, "plan.json")
    if os.path.exists(plan_file):
        with open(plan_file) as f:
            plan = SMTPlan.from_json(f.read())

    template = jax.tree.map(lambda x: x, trainer.state)
    host_frozen = None
    scan = False
    if meta["phase"] == "sparse" and trainer.phase == "warmup":
        # build a structural template for the sparse state
        from sparse_matrix_tuning_tpu.train.convert import (
            build_qweights, offload_frozen_to_host, resolve_frozen_quant)
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            build_scan_sparse_state, offload_scan_frozen_to_host,
            resolve_scan_layers)
        from sparse_matrix_tuning_tpu.train.steps import init_sparse_state
        scan = resolve_scan_layers(trainer.cfg, trainer.model_cfg, plan.mode)
        host_frozen = _load_host_frozen(path)
        saved = meta.get("resolved")
        if saved is not None:
            from sparse_matrix_tuning_tpu.train.convert import (
                resolve_frozen_quant, resolve_head_quant)
            # checkpoints written before head_quant existed have no q_head
            # leaf: treat the missing key as "none" so a resolution change
            # fails with the actionable guard, not an orbax mismatch
            saved.setdefault("head_quant", "none")
            now_fq = resolve_frozen_quant(trainer.cfg, plan.mode, scan=scan)
            now = {"scan": scan,
                   "host_offload": host_frozen is not None,
                   "frozen_quant": now_fq,
                   "head_quant": resolve_head_quant(trainer.cfg,
                                                    trainer.model_cfg,
                                                    now_fq)}
            diffs = {k: (saved[k], now[k]) for k in now
                     if k in saved and saved[k] != now[k]}
            if diffs:
                hints = []
                if "frozen_quant" in diffs:
                    hints.append(
                        "set --frozen_quant explicitly to the saved value "
                        f"({diffs['frozen_quant'][0]!r}) — 'auto' resolves "
                        "by backend platform, so TPU-written checkpoints "
                        "need it pinned to restore elsewhere")
                if "scan" in diffs:
                    hints.append(
                        f"set --scan_layers {'on' if diffs['scan'][0] else 'off'} "
                        "to match the saved state layout")
                if "head_quant" in diffs:
                    hints.append(
                        "set --head_quant explicitly to the saved value "
                        f"({diffs['head_quant'][0]!r}) — 'auto' follows "
                        "frozen_quant/loss policy resolution")
                raise ValueError(
                    "checkpoint was saved with a different resolved sparse-"
                    f"phase layout: {{k: (saved, now)}} = {diffs}. "
                    + "; ".join(hints))
        master = trainer.state["master"]
        if scan:
            template = build_scan_sparse_state(trainer.cfg, trainer.state,
                                               plan, trainer.model_cfg)
            if host_frozen is not None:
                template, _ = offload_scan_frozen_to_host(template,
                                                          keep_host=False)
        else:
            params = jax.tree.map(lambda p: p.astype(trainer.cfg.param_dtype),
                                  master)
            trainable = plan.gather(master["layers"])
            template = init_sparse_state(params, trainable, step=0)
            # NB: frozen_quant="auto" resolves by platform, so a checkpoint
            # must be restored on the same backend class it was written on
            fq_now = resolve_frozen_quant(trainer.cfg, plan.mode)
            if fq_now == "int8":
                template["q"] = build_qweights(master["layers"], plan)
            from sparse_matrix_tuning_tpu.train.convert import (
                build_q_head, resolve_head_quant)
            if resolve_head_quant(trainer.cfg, trainer.model_cfg,
                                  fq_now) == "int8":
                template["q_head"] = build_q_head(master, trainer.model_cfg)
            if host_frozen is not None:
                # the checkpoint was written with the dense weights on host
                # — match its placeholder structure (values come from the
                # sidecar: the conversion-time warm-up-trained weights)
                template, _ = offload_frozen_to_host(template,
                                                     keep_host=False)

    restored = _ckptr().restore(os.path.join(os.path.abspath(path), "state"),
                                item=template)
    was_warmup = trainer.phase == "warmup"
    trainer.state = restored
    trainer.best_eval_loss = meta["best_eval_loss"]
    if meta["phase"] == "sparse":
        trainer.plan = plan
        if was_warmup:  # already-converted trainers keep their own flags
            trainer._scan = scan
            trainer._host_frozen = host_frozen
        trainer.install_sparse_phase()
    trainer._place_state(plan_mode=plan.mode if plan else None)
