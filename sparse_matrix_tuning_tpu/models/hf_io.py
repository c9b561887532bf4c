"""HuggingFace interop: load Llama-family checkpoints into SMT pytrees and
export merged dense checkpoints HF can load.

Replaces the reference's create_hf_model / load_hf_tokenizer /
save_hf_format (reference deepspeed/helpers/deepspeed_helpers.py:286-364,
:590-660). Exported checkpoints are always merged-dense (the reference's
raw saves leak both `weight` and `selected_weight` keys unless merge-back
is run — deepspeed_helpers.py:350-351 TODO; here the dense weights are the
single source of truth, so export is trivially clean).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import LlamaConfig

# reference deepspeed/helpers/model_names.py — families needing pad_token_id=0
LLAMA3_FAMILY_MARKERS = ("Llama-3", "llama-3", "Meta-Llama-3", "DeepSeek-R1-Distill-Llama")


# ---------------------------------------------------------------------------
# Name mapping
# ---------------------------------------------------------------------------

def _hf_to_tree_name(name: str) -> Optional[tuple]:
    """HF state-dict key -> path into our pytree; None = skip (buffers)."""
    bias = False
    if name.endswith(".weight"):
        name = name[: -len(".weight")]
    elif name.endswith(".bias"):  # Qwen2-style QKV biases
        name = name[: -len(".bias")]
        bias = True
    else:
        return None  # skip rotary buffers etc.
    if bias:
        parts = name.split(".")
        if len(parts) >= 5 and parts[0] == "model" and parts[1] == "layers" \
                and parts[3] in ("self_attn", "mlp"):
            return ("layers", parts[2], f"{parts[4]}_bias")
        return None
    if name == "model.embed_tokens":
        return ("embed_tokens",)
    if name == "model.norm":
        return ("norm",)
    if name == "lm_head":
        return ("lm_head",)
    parts = name.split(".")
    if len(parts) >= 4 and parts[0] == "model" and parts[1] == "layers":
        layer = parts[2]
        sub = parts[3:]
        if sub[0] in ("input_layernorm", "post_attention_layernorm"):
            return ("layers", layer, sub[0])
        if sub[0] in ("self_attn", "mlp") and len(sub) == 2:
            return ("layers", layer, sub[1])
    return None


def _tree_to_hf_name(path: tuple) -> str:
    if path == ("embed_tokens",):
        return "model.embed_tokens.weight"
    if path == ("norm",):
        return "model.norm.weight"
    if path == ("lm_head",):
        return "lm_head.weight"
    _, layer, module = path
    suffix = ".weight"
    if module.endswith("_bias"):
        module, suffix = module[: -len("_bias")], ".bias"
    group = "self_attn" if module.endswith(("q_proj", "k_proj", "v_proj", "o_proj")) \
        else "mlp" if module in ("gate_proj", "up_proj", "down_proj") else None
    if group is None:
        return f"model.layers.{layer}.{module}{suffix}"
    return f"model.layers.{layer}.{group}.{module}{suffix}"


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------

def load_hf_config(model_dir: str) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    from sparse_matrix_tuning_tpu.models.registry import resolve_family
    resolve_family(raw.get("model_type", "llama"))
    return LlamaConfig.from_hf(raw)


def load_hf_params(model_dir: str, cfg: Optional[LlamaConfig] = None,
                   dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Read a local HF checkpoint dir (safetensors preferred, .bin fallback)."""
    cfg = cfg or load_hf_config(model_dir)
    state: Dict[str, np.ndarray] = {}

    st_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open
        for fname in st_files:
            with safe_open(os.path.join(model_dir, fname), framework="np") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)  # bf16 arrives as ml_dtypes.bfloat16
    else:
        import torch
        bin_files = sorted(f for f in os.listdir(model_dir)
                           if f.startswith("pytorch_model") and f.endswith(".bin"))
        if not bin_files:
            raise FileNotFoundError(f"no safetensors or pytorch_model*.bin in {model_dir}")
        for fname in bin_files:
            sd = torch.load(os.path.join(model_dir, fname), map_location="cpu",
                            weights_only=True)
            for k, v in sd.items():
                state[k] = _torch_to_numpy(v)

    params: Dict[str, Any] = {"layers": {}}
    for k, v in state.items():
        path = _hf_to_tree_name(k)
        if path is None:
            continue
        arr = jnp.asarray(v).astype(dtype)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    elif "lm_head" not in params:
        # some checkpoints tie implicitly by omitting lm_head
        params["lm_head"] = params["embed_tokens"]
    return params


def _torch_to_numpy(t) -> np.ndarray:
    import ml_dtypes
    import torch
    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        return t.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def load_hf_params_sharded(model_dir: str, mesh, cfg: Optional[LlamaConfig] = None,
                           dtype=jnp.bfloat16):
    """Shard-aware checkpoint load for models too large to materialise on
    host (BASELINE.json configs[4]: Llama-3-70B on a v5p-64): each device
    reads ONLY its slice of each safetensors tensor via lazy get_slice, and
    jax.make_array_from_callback assembles the global sharded array.

    Replaces the reference's ZeRO-3 loader (load_state_dict_into_model,
    deepspeed_helpers.py:533-572), which gathers full params per module.
    """
    import jax
    from jax.sharding import NamedSharding
    from sparse_matrix_tuning_tpu.parallel import mesh as mesh_mod

    cfg = cfg or load_hf_config(model_dir)
    st_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".safetensors"))
    if not st_files:
        raise FileNotFoundError(f"no .safetensors in {model_dir} (sharded load "
                                "requires safetensors)")
    from safetensors import safe_open

    # index: hf key -> (file, shape)
    index = {}
    for fname in st_files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for k in f.keys():
                index[k] = (fname, tuple(f.get_slice(k).get_shape()))

    # probe structure to derive pspecs (shapes only, no data)
    structure: Dict[str, Any] = {"layers": {}}
    paths = {}
    for k, (fname, shape) in index.items():
        path = _hf_to_tree_name(k)
        if path is None:
            continue
        node = structure
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.zeros((0,))  # placeholder leaf
        paths[path] = (k, fname, shape)
    if cfg.tie_word_embeddings:
        structure.pop("lm_head", None)
        paths = {p: v for p, v in paths.items() if p != ("lm_head",)}

    specs = mesh_mod.param_pspecs(structure)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def fit(spec, shape):
        out = []
        for d, names in enumerate(spec):
            if names is None:
                out.append(None)
                continue
            group = names if isinstance(names, tuple) else (names,)
            size = int(np.prod([axis_sizes[n] for n in group]))
            out.append(names if shape[d] % size == 0 else None)
        from jax.sharding import PartitionSpec as P
        return P(*out)

    def build(path, spec):
        key, fname, shape = paths[path]
        sharding = NamedSharding(mesh, fit(spec, shape))
        fpath = os.path.join(model_dir, fname)

        def cb(idx):
            with safe_open(fpath, framework="np") as f:
                chunk = f.get_slice(key)[idx]
            return jnp.asarray(chunk).astype(dtype)

        return jax.make_array_from_callback(shape, sharding, cb)

    params: Dict[str, Any] = {"layers": {}}
    for path in paths:
        spec = specs
        for p in path:
            spec = spec[p]
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = build(path, spec)
    return params


# ---------------------------------------------------------------------------
# Save
# ---------------------------------------------------------------------------

def save_hf_format(params: Mapping[str, Any], cfg: LlamaConfig, output_dir: str,
                   tokenizer=None, dtype=None) -> None:
    """Write model.safetensors + config.json (+ tokenizer) — a vanilla HF
    checkpoint (reference save_hf_format, deepspeed_helpers.py:341-364)."""
    os.makedirs(output_dir, exist_ok=True)
    flat: Dict[str, jnp.ndarray] = {}

    def visit(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                visit(v, path + (k,))
        else:
            arr = jnp.asarray(node)
            if dtype is not None:
                arr = arr.astype(dtype)
            flat[_tree_to_hf_name(path)] = arr

    visit(dict(params), ())
    if cfg.tie_word_embeddings:
        flat.pop("lm_head.weight", None)

    from safetensors.flax import save_file
    save_file(flat, os.path.join(output_dir, "model.safetensors"),
              metadata={"format": "pt"})
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(cfg.to_hf(), f, indent=2)
    if tokenizer is not None:
        tokenizer.save_pretrained(output_dir)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

def load_hf_tokenizer(model_name_or_path: str, max_seq_len: int = 2048,
                      add_eot_token: bool = False):
    """Reference load_hf_tokenizer/get_tokenizer semantics
    (deepspeed_helpers.py:286-336): fast tokenizer, pad token fixups —
    Llama-3 family gets pad_token_id=0, others fall back to eos."""
    from transformers import AutoTokenizer
    add_special = {"additional_special_tokens": ["<|endoftext|>"]} if add_eot_token else None
    tok = AutoTokenizer.from_pretrained(model_name_or_path, fast_tokenizer=True)
    if add_special:
        tok.add_special_tokens(add_special)
    if any(m in str(model_name_or_path) for m in LLAMA3_FAMILY_MARKERS):
        tok.pad_token_id = 0
    if tok.pad_token is None:
        if tok.eos_token is not None:
            tok.pad_token = tok.eos_token
        else:
            tok.pad_token_id = 0
    tok.model_max_length = max_seq_len
    return tok
