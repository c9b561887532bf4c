"""Block-masked Adam + param-group LR logic + global-norm clipping.

Replaces the reference's FusedAdam/DeepSpeedCPUAdam (CUDA/C++ multi-tensor
kernels, reference deepspeed/fine_tune.py:168-172,352,529) with a
functional Adam over the *trainable* pytree only — in the sparse phase the
trainable pytree is the gathered (n_blocks, 256, 256) tensors, so optimizer
state (m, v) is proportional to the ~0.7-0.9% selected fraction, which is
SMT's memory headline.

Param groups (reference deepspeed/smt/smt.py:465-549 and :554-638):
  * decay group @ base lr, no-decay group (norms/biases/1-D) @ wd 0
  * the group lr OVERRIDES the constructor lr (quirk preserved: after
    conversion the effective lr is smt_lr, not ft_learning_rate —
    smt.py:506-519 vs fine_tune.py:361-363)
  * optional q/k LR boost: q_proj/k_proj trainables get qk_lr_times x lr
    (--qk_scheduler, smt.py:554-638)

On TPU the fused multi-tensor concern disappears: XLA fuses the whole
per-tensor update chain into one pass over HBM; a Pallas fused update for
the gathered block tensor lives in ops/pallas/masked_adam.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AdamConfig:
    betas: Sequence[float] = (0.9, 0.95)
    eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 1.0   # DS config gradient_clipping: 1.0 (deepspeed_helpers.py:88)


def adam_init(trainable) -> Dict:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), trainable)
    return {"m": zeros, "v": jax.tree.map(jnp.copy, zeros),
            "count": jnp.zeros((), jnp.int32)}


def global_norm(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def clip_by_global_norm(grads, max_norm: float):
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale), grads), norm


def adam_step(
    grads,
    opt_state: Mapping,
    params,
    lr: jax.Array,
    cfg: AdamConfig,
    lr_scale: Optional[Callable[[str], float]] = None,
    wd_mask: Optional[Callable[[str], bool]] = None,
):
    """One Adam update over an arbitrary pytree of fp32 params.

    lr_scale / wd_mask map a flat key path ("a/b/c") to a per-tensor LR
    multiplier / decay eligibility — the param-group mechanism.
    Returns (new_params, new_opt_state).
    """
    b1, b2 = cfg.betas
    count = opt_state["count"] + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c

    flat_params = _flatten(params)
    flat_grads = _flatten(grads)
    flat_m = _flatten(opt_state["m"])
    flat_v = _flatten(opt_state["v"])

    new_p, new_m, new_v = {}, {}, {}
    for key, p in flat_params.items():
        g = flat_grads[key].astype(jnp.float32)
        m = flat_m[key] * b1 + g * (1.0 - b1)
        v = flat_v[key] * b2 + jnp.square(g) * (1.0 - b2)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
        k_lr = lr * (lr_scale(key) if lr_scale is not None else 1.0)
        wd = cfg.weight_decay if (wd_mask is None or wd_mask(key)) else 0.0
        if wd:
            update = update + wd * p.astype(jnp.float32)
        new_p[key] = (p.astype(jnp.float32) - k_lr * update).astype(p.dtype)
        new_m[key] = m
        new_v[key] = v

    treedef = jax.tree.structure(params)
    return (
        _unflatten(new_p, params),
        {"m": _unflatten(new_m, opt_state["m"]),
         "v": _unflatten(new_v, opt_state["v"]),
         "count": count},
    )


def _flatten(tree) -> Dict[str, jax.Array]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out["/".join(_path_str(p) for p in path)] = leaf
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _unflatten(flat: Dict[str, jax.Array], like):
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, _ in paths:
        leaves.append(flat["/".join(_path_str(p) for p in path)])
    return jax.tree.unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Param-group policies
# ---------------------------------------------------------------------------

# Reference no-decay list is bias/layernorm/norm/ln_f only — embeddings DO
# decay there, so they decay here too (ADVICE r1: embed_tokens was wrongly
# excluded, silently deviating from the reference grouping under --w_decay).
NO_DECAY_MARKERS = ("norm", "bias")


def full_ft_wd_mask(key: str) -> bool:
    """Decay only matrix weights (reference get_optimizer_grouped_parameters
    convention: biases/norms excluded)."""
    return not any(m in key for m in NO_DECAY_MARKERS)


def make_qk_lr_scale(qk_lr_times: float) -> Callable[[str], float]:
    """q_proj/k_proj trainables get a boosted LR (reference
    get_optimizer_qk_augment_grouped_parameters, smt.py:554-638)."""
    def scale(key: str) -> float:
        return float(qk_lr_times) if ("q_proj" in key or "k_proj" in key) else 1.0
    return scale


# ---------------------------------------------------------------------------
# LR schedules (HF get_scheduler parity: linear / cosine / constant)
# ---------------------------------------------------------------------------

def make_lr_schedule(kind: str, base_lr: float, warmup_steps: int,
                     total_steps: int) -> Callable[[jax.Array], jax.Array]:
    total_steps = max(int(total_steps), 1)
    warmup_steps = int(warmup_steps)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        if kind == "linear":
            decay = jnp.maximum(
                0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        elif kind == "cosine":
            progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
            progress = jnp.clip(progress, 0.0, 1.0)
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        elif kind == "constant":
            decay = jnp.ones(())
        else:
            raise ValueError(f"unknown lr scheduler {kind!r}")
        return base_lr * jnp.where(step < warmup_steps, jnp.minimum(warm, 1.0), decay)

    return sched
