"""Device mesh + sharding rules — the TPU-native replacement for DeepSpeed
ZeRO (reference --zero_stage / deepspeed.initialize, fine_tune.py:184-190,
deepspeed_helpers.py:37-146).

Axes:
  data   — pure data parallelism (reference's only training parallelism,
           DistributedSampler fine_tune.py:133-134)
  fsdp   — parameter/grad/optimizer-state sharding over ICI (ZeRO-3
           equivalent; batch is also split over this axis, as in FSDP)
  tensor — megatron-style tensor parallelism over hidden dims (the
           reference only has vestigial TP config fields,
           deepspeed_helpers.py:90-97; here it is a real axis)

All collectives (grad psum, FSDP all-gathers, TP reduce) are inserted and
overlapped by XLA GSPMD from these annotations — no NCCL-style explicit
calls (replaces deepspeed.comm / torch.distributed usage inventoried in
SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor")

# The mesh the current step functions are being built for. Model code that
# needs explicit SPMD handling (shard_map around Pallas kernels, which have
# no GSPMD partitioning rule) reads it at trace time; None = single-device.
_COMPUTE_MESH: Optional[Mesh] = None


def set_compute_mesh(mesh: Optional[Mesh]) -> None:
    global _COMPUTE_MESH
    _COMPUTE_MESH = mesh


def compute_mesh() -> Optional[Mesh]:
    return _COMPUTE_MESH


def is_cpu_3d_hazard(mesh: Mesh) -> bool:
    """True iff mesh is an all-axes>1 3D mesh on the CPU backend — the shape
    on which XLA's CPU GSPMD partitioner is known to miscompile a full-model
    program that embeds a shard_map region (fullk attention): shard-group
    swap in the first residual add → step-1 loss silently off by ~3e-3 (see
    CLAUDE.md; reproduced on jax 0.8.x with 8 virtual devices). Einsum-only
    programs and isolated shard_map kernels are verified clean on the same
    mesh (tests pin both), and any factorization with a size-1 axis is
    entirely clean — (1,4,2), (2,4,1), (1,8,1). TPU meshes are unaffected.
    SMTTrainer refuses the hazardous combination (explicit attn_impl=fullk
    on such a mesh) — loud error > silent wrong numerics; reference users
    get NCCL errors loudly, never corruption."""
    shape = mesh.devices.shape
    return (len(shape) == 3 and all(int(s) > 1 for s in shape)
            and mesh.devices.flat[0].platform == "cpu")


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """mesh_shape = (data, fsdp, tensor); default puts every device on fsdp.

    See is_cpu_3d_hazard for the one known-bad CPU shape family (SMTTrainer
    guards the miscompiling combination)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (1, n, 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != #devices {n}")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, AXES)


# ---------------------------------------------------------------------------
# PartitionSpecs
# ---------------------------------------------------------------------------

# Megatron layout: column-parallel projections shard their output dim over
# `tensor`, row-parallel shard their input dim; `fsdp` takes the other dim.
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_PARALLEL = ("o_proj", "down_proj")


def _weight_pspec(module: str) -> P:
    if module in _COL_PARALLEL:
        return P("tensor", "fsdp")
    if module in _ROW_PARALLEL:
        return P("fsdp", "tensor")
    raise KeyError(module)


def param_pspecs(params: Mapping[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching models.llama param structure."""
    specs: Dict[str, Any] = {
        "embed_tokens": P("fsdp", "tensor"),
        "norm": P(),
        "layers": {},
    }
    for li, layer in params["layers"].items():
        ls = {}
        for name in layer:
            if name.endswith("layernorm") or name.endswith("_bias"):
                ls[name] = P()
            else:
                ls[name] = _weight_pspec(name)
        specs["layers"][li] = ls
    if "lm_head" in params:
        specs["lm_head"] = P("tensor", "fsdp")
    return specs


def batch_pspec() -> P:
    """Batch is split over data AND fsdp (fsdp acts as a data axis for
    activations, standard FSDP)."""
    return P(("data", "fsdp"), None)


def trainable_pspec(mode: str) -> P:
    """Gathered trainables: matrix (n, 256, 256) shards the intra-block row
    dim over fsdp (256 divides any power-of-two axis; n is small and
    arbitrary); channel (out, n_ch) shards out over fsdp."""
    if mode == "matrix":
        return P(None, "fsdp", None)
    return P("fsdp", None)


def acc_pspecs_like(acc: Mapping[str, Any], params_specs: Mapping[str, Any]) -> Dict[str, Any]:
    """Saliency accumulators share their weight's sharding (key '{layer}.{module}')."""
    out = {}
    for ks in acc:
        layer, module = ks.split(".", 1)
        out[ks] = params_specs["layers"][layer][module]
    return out


def state_shardings(state, mesh: Mesh, plan_mode: Optional[str] = None):
    """NamedSharding pytree for a train-state dict (see train/trainer.py).

    Rules: model/master params & their adam state follow param_pspecs;
    trainable blocks & their adam state shard over fsdp; scalars replicate;
    activation accumulators (S, C) shard C over tensor.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def _fit(spec: P, shape) -> P:
        """Drop sharding on axes that do not divide the dimension evenly
        (device_put, unlike GSPMD propagation, refuses uneven shards).
        Also truncates to the leaf's rank (host-offload placeholders have
        fewer dims than their spec)."""
        out = []
        spec = P(*tuple(spec)[:len(shape)])
        for d, names in enumerate(spec):
            if names is None:
                out.append(None)
                continue
            group = names if isinstance(names, tuple) else (names,)
            size = int(np.prod([axis_sizes[n] for n in group]))
            out.append(names if (d < len(shape) and shape[d] % size == 0) else None)
        return P(*out)

    def named(spec, leaf):
        return NamedSharding(mesh, _fit(spec, getattr(leaf, "shape", ())))

    _PARAM_TOPS = ("embed_tokens", "norm", "layers", "layers_stacked",
                   "lm_head")

    def _stacked_trainable_pspec():
        # scan layout: (L, n, 256, 256) — shard the intra-block row dim
        return P(None, None, "fsdp", None)

    def _trainable_spec(leaf):
        """Mode/layout dispatch for trainable/base/m/v leaves: matrix scan
        (L, n, 256, 256) is 4-D; channel scan (L, O, n) is 3-D with O
        sharded over fsdp; unrolled layouts keep trainable_pspec."""
        nd = getattr(leaf, "ndim", 0)
        if nd == 4:
            return _stacked_trainable_pspec()
        if nd == 3 and plan_mode == "channel":
            return P(None, "fsdp", None)
        return trainable_pspec(plan_mode) if plan_mode else P()

    def spec_for(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        top = keys[0]
        if top in ("params", "master"):
            return _param_leaf_spec(keys[1:])
        if top in ("m", "v"):
            # warm-up phase: adam state mirrors the param tree;
            # sparse phase: it mirrors the flat trainable dict.
            if len(keys) > 1 and keys[1] in _PARAM_TOPS:
                return _param_leaf_spec(keys[1:])
            return _trainable_spec(leaf)
        if top == "acc":
            if "." not in keys[1]:
                # scan warm-up (keyed by bare module name): grad_sum holds
                # FULL weight-sized (L, R, C) fp32 sums — they must shard
                # like the stacked weight (the reference keeps grad sums off
                # the accelerator entirely, fine_tune.py:729-740; replicating
                # them in HBM would defeat FSDP). per_step_stats (L, RB, CB)
                # gets the same spec: tiny either way, and _fit drops any
                # axis that does not divide.
                return P(None, *_weight_pspec(keys[1]))
            _, module = keys[1].split(".", 1)
            return _weight_pspec(module)
        if top == "act_acc":
            # channel saliency. 3-D = scan grad_sum (L, S, C) positional
            # activation sums — the largest accumulator in the system
            # (~12 GB at 8B/seq-2048): shard S over fsdp and C over tensor
            # so it splits on pure-fsdp AND tensor meshes. 2-D layouts
            # ((S, C) unrolled, (L, C) scan stats) keep C on tensor.
            if getattr(leaf, "ndim", 0) == 3:
                return P(None, "fsdp", "tensor")
            return P(None, "tensor")
        if top == "trainable":
            return _trainable_spec(leaf)
        if top == "base":  # scan layout: stacked frozen block/column values
            return _trainable_spec(leaf)
        if top == "idx":   # tiny coordinate arrays: replicate
            return P()
        if top == "q":
            # frozen int8 base — unrolled: {"{li}.{mod}": {"wq" (O,I),
            # "sw" (O,), "base" (n,256,256)}}; scan: {"{mod}": {"wq"
            # (L,O,I), "sw" (L,O)}}
            stacked = "." not in keys[1]
            module = keys[1] if stacked else keys[1].split(".", 1)[1]
            field = keys[2]
            if field == "wq":
                w = _weight_pspec(module)
                return P(None, *w) if stacked else w
            if field == "sw":  # indexed by the weight's OUT dim
                out_axis = _weight_pspec(module)[0]
                return P(None, out_axis) if stacked else P(out_axis)
            return trainable_pspec("matrix")  # base blocks (unrolled only)
        if top == "q_head":
            # int8 lm-head {wq (V, D), sw (V,)}: mirror the bf16 lm_head
            return P("tensor", "fsdp") if keys[1] == "wq" else P("tensor")
        return P()

    def _param_leaf_spec(sub):
        if not sub:
            return P()
        if sub[0] == "embed_tokens":
            return P("fsdp", "tensor")
        if sub[0] == "lm_head":
            return P("tensor", "fsdp")
        if sub[0] == "norm":
            return P()
        if sub[0] == "layers":
            name = sub[2]
            if name.endswith("layernorm") or name.endswith("_bias"):
                return P()
            return _weight_pspec(name)
        if sub[0] == "layers_stacked":
            name = sub[1]
            if name.endswith("layernorm") or name.endswith("_bias"):
                return P()
            return P(None, *_weight_pspec(name))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: named(spec_for(path, leaf), leaf), state)
