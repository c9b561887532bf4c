"""Llama-family decoder in pure JAX (pytrees + functions, no framework).

Covers the model families the reference fine-tunes (Llama-2/3, TinyLlama,
DeepSeek-R1-Distill-Llama — reference deepspeed/helpers/model_names.py and
deepspeed_helpers.py:590-624): RMSNorm, rotary embeddings (HF non-interleaved
convention for weight parity), grouped-query attention, SiLU gate/up/down MLP,
optional tied embeddings.

The six SMT target linears ({q,k,v}_proj, {gate,up,down}_proj — reference
fine_tune.py:217-220) route through a dispatch hook so that, after
conversion, selected layers compute through the block-sparse custom_vjp
linear (ops/sparse_linear.py) while everything else stays a dense MXU matmul.

Layers are kept as separate pytree entries (params["layers"]["<i>"]) rather
than a scanned stack: SMT selection gives every layer a *different* static
number of trainable blocks, which an unrolled graph expresses with zero
padding waste; per-layer jax.checkpoint still bounds activation memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

ATTN_TARGETS = ("q_proj", "k_proj", "v_proj")
MLP_TARGETS = ("gate_proj", "up_proj", "down_proj")
TARGET_MODULES = ATTN_TARGETS + MLP_TARGETS


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "LlamaConfig":
        """A block-divisible toy config for tests (all linears >= 256x256)."""
        return cls(vocab_size=vocab_size, hidden_size=256, intermediate_size=512,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, max_position_embeddings=512)

    @classmethod
    def from_hf(cls, hf_cfg: Mapping[str, Any]) -> "LlamaConfig":
        return cls(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            intermediate_size=hf_cfg["intermediate_size"],
            num_hidden_layers=hf_cfg["num_hidden_layers"],
            num_attention_heads=hf_cfg["num_attention_heads"],
            num_key_value_heads=hf_cfg.get("num_key_value_heads",
                                           hf_cfg["num_attention_heads"]),
            max_position_embeddings=hf_cfg.get("max_position_embeddings", 2048),
            rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        )

    def to_hf(self) -> Dict[str, Any]:
        return {
            "architectures": ["LlamaForCausalLM"],
            "model_type": "llama",
            "vocab_size": self.vocab_size,
            "hidden_size": self.hidden_size,
            "intermediate_size": self.intermediate_size,
            "num_hidden_layers": self.num_hidden_layers,
            "num_attention_heads": self.num_attention_heads,
            "num_key_value_heads": self.num_key_value_heads,
            "max_position_embeddings": self.max_position_embeddings,
            "rms_norm_eps": self.rms_norm_eps,
            "rope_theta": self.rope_theta,
            "tie_word_embeddings": self.tie_word_embeddings,
            "hidden_act": "silu",
            "torch_dtype": "bfloat16",
        }


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Dict:
    """Random init (tests / from-scratch). HF loading is in models/hf_io.py."""
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    keys = iter(jax.random.split(rng, 4 + 7 * cfg.num_hidden_layers))

    def dense(key, out_dim, in_dim):
        scale = 1.0 / np.sqrt(in_dim)
        return (jax.random.normal(key, (out_dim, in_dim), jnp.float32) * scale).astype(dtype)

    params: Dict[str, Any] = {
        "embed_tokens": (jax.random.normal(next(keys), (v, d), jnp.float32) * 0.02).astype(dtype),
        "norm": jnp.ones((d,), dtype),
        "layers": {},
    }
    for i in range(cfg.num_hidden_layers):
        params["layers"][str(i)] = {
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
            "q_proj": dense(next(keys), d, d),
            "k_proj": dense(next(keys), kv, d),
            "v_proj": dense(next(keys), kv, d),
            "o_proj": dense(next(keys), d, d),
            "gate_proj": dense(next(keys), f, d),
            "up_proj": dense(next(keys), f, d),
            "down_proj": dense(next(keys), d, f),
        }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (jax.random.normal(next(keys), (v, d), jnp.float32) * 0.02).astype(dtype)
    return params


def target_module_dims(params: Mapping[str, Any]) -> Dict[str, tuple]:
    """{module_name: (out_dim, in_dim)} for the six SMT targets
    (reference fine_tune.py:221-229 harvests these from actual shapes)."""
    layer0 = params["layers"]["0"]
    return {m: tuple(layer0[m].shape) for m in TARGET_MODULES}


def all_2d_param_shapes(params: Mapping[str, Any]) -> list:
    """Shapes of every 2-D param (for the total-block denominator quirk,
    reference fine_tune.py:231-241 — includes embeddings and lm_head)."""
    return [p.shape for p in jax.tree.leaves(params) if getattr(p, "ndim", 0) == 2]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight.astype(jnp.float32)).astype(dt)


def _rope_tables(positions: jax.Array, head_dim: int, theta: float):
    """HF convention: inv_freq over even dims, cos/sin tiled twice."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]  # (..., S, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x: (B, S, H, hd); cos/sin: (B, S, hd)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


def default_linear(x: jax.Array, w: jax.Array, module: str, layer: int) -> jax.Array:
    """Dense linear y = x @ W.T (weights stored HF-style as (out, in))."""
    return jnp.einsum("...i,oi->...o", x, w)


def _attention(q, k, v, mask_bias, dropout_rate: float = 0.0,
               dropout_rng=None):
    """q: (B,S,Hq,hd); k/v: (B,S,Hkv,hd); GQA via head grouping.
    mask_bias: (B,1,S,S) additive fp32 bias (0 / -inf)."""
    b, s, hq, hd = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    q = q.reshape(b, s, hkv, groups, hd)
    scores = jnp.einsum("bqkgd,bskd->bkgqs", q, k).astype(jnp.float32)
    scores = scores / np.sqrt(hd)
    scores = scores + mask_bias[:, :, None, :, :]  # (B,1,1,S,S) broadcast over kv-heads/groups
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    probs = _attn_dropout(probs, dropout_rate, dropout_rng)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v)
    return out.reshape(b, s, hq * hd)


def _flash_attention(q, k, v):
    """Fused Pallas flash attention (TPU): causal, right-padding safe — pad
    keys sit causally after every real query, so they are never attended;
    pad-query outputs are dropped by the loss mask. GQA via KV-head repeat.

    Block sizes tuned on v5e (tools/attn_tune.py): 512/512 runs the
    fwd+bwd ~10x faster than the kernel's defaults at seq 1024."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    b, s, hq, hd = q.shape
    hkv = k.shape[2]
    if hkv != hq:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    blk = min(512, s)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    # kernel layout: (B, H, S, D)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=True,
        sm_scale=1.0 / float(np.sqrt(hd)), block_sizes=bs)
    return out.transpose(0, 2, 1, 3).reshape(b, s, hq * hd)


def _fullk_attention(q, k, v):
    """Fused v5e Pallas attention with the full K/V row VMEM-resident
    (ops/pallas/attention.py): causal + right-padding safe like flash, one
    fused backward pass, no fp32 score/prob HBM traffic. GQA handled
    natively (no KV repeat). On a multi-device mesh the kernel runs under
    shard_map (batch over data/fsdp, heads over tensor); falls back to the
    einsum path when the mesh does not divide the shape."""
    from sparse_matrix_tuning_tpu.ops.pallas.attention import (
        fullk_attention, fullk_attention_spmd, fullk_supported_on_mesh)
    from sparse_matrix_tuning_tpu.parallel.mesh import compute_mesh
    b, s, hq, hd = q.shape
    sm = 1.0 / float(np.sqrt(hd))
    mesh = compute_mesh()
    if mesh is not None and mesh.devices.size > 1:
        if not fullk_supported_on_mesh(mesh, b, hq, k.shape[2]):
            return None  # caller falls back to einsum
        out = fullk_attention_spmd(q, k, v, sm, mesh)
    else:
        out = fullk_attention(q, k, v, sm)
    return out.reshape(b, s, hq * hd)


def resolve_attn_impl(attn_impl: str, seq_len: int, head_dim: int) -> str:
    """Measured on v5e (tools/attn_fullk_bench.py, tools/attn_tune.py):

      * the hand-written fullk Pallas kernel (ops/pallas/attention.py) beats
        XLA einsum attention across training lengths at hd=128 — fwd+bwd
        2.06x at s1024 (b8/hq32/hkv8), 2.23x at s2048, 2.78x at s4096 — no
        fp32 score/prob HBM traffic, one fused bwd pass. At hd=96 (non-
        lane-aligned) fwd+bwd is still 1.17x but the pure forward is 0.61x
        (Mosaic pads the 96-wide lanes), so non-multiples of 128 stay on
        einsum (eval/loss-only passes are forward-only);
      * XLA einsum in turn beats the stock Pallas flash kernel at seq
        1024-4096 (bwd ~1.8x, e.g. 13.7ms vs 24.7ms at seq 2048).

    "auto" resolves to fullk on TPU at training lengths (validated to seq
    4096) with 128-aligned head_dim — on a single device directly, and on
    GSPMD meshes through the shard_map wrapper (_fullk_attention: batch over
    data/fsdp, heads over tensor — attention is local to (batch, head), so
    the per-shard kernel shapes are identical to the single-chip case and
    the measured 2.06-2.78x win carries; per-call fullk_supported_on_mesh
    falls back to einsum when the mesh does not divide the shape). einsum
    elsewhere: CPU (interpret-mode Pallas is test-only; plus the CPU-3D-mesh
    shard_map miscompile, parallel.mesh.is_cpu_3d_hazard) and multi-device
    without a compute mesh (a bare pallas_call has no SPMD partitioning
    rule, so XLA would all-gather the sharded batch around it). flash stays
    opt-in for longer-context regimes."""
    if attn_impl != "auto":
        return attn_impl
    from sparse_matrix_tuning_tpu.parallel.mesh import compute_mesh
    if (jax.devices()[0].platform == "tpu"
            and seq_len <= 4096 and head_dim % 128 == 0
            and (jax.device_count() == 1 or compute_mesh() is not None)):
        return "fullk"
    return "einsum"


def _attn_dropout(probs: jax.Array, rate: float, rng: Optional[jax.Array]):
    """Attention-prob dropout (reference configure_dropout sets
    attention_dropout on Llama configs, deepspeed_helpers.py:577-583).
    Inverted scaling; active only when a train rng is supplied."""
    if rate <= 0.0 or rng is None:
        return probs
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    return jnp.where(keep, probs / (1.0 - rate), 0.0).astype(probs.dtype)


def _lin(lp: Mapping[str, jax.Array], h: jax.Array, name: str, linear,
         layer_idx: int) -> jax.Array:
    """Linear via the dispatch hook, plus bias when the checkpoint has one
    (Qwen2-style QKV biases). Biases are never SMT-selected (the reference
    targets weight matrices only) and stay frozen after conversion."""
    y = linear(h, lp[name], name, layer_idx)
    bias = lp.get(f"{name}_bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _decoder_layer(lp: Mapping[str, jax.Array], x: jax.Array, mask_bias, cos, sin,
                   cfg: LlamaConfig, linear, layer_idx: int,
                   attn_impl: str = "einsum",
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    b, s, d = x.shape
    h = _rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    q = _lin(lp, h, "q_proj", linear, layer_idx)
    k = _lin(lp, h, "k_proj", linear, layer_idx)
    v = _lin(lp, h, "v_proj", linear, layer_idx)
    hd = cfg.head_dim
    q = q.reshape(b, s, cfg.num_attention_heads, hd)
    k = k.reshape(b, s, cfg.num_key_value_heads, hd)
    v = v.reshape(b, s, cfg.num_key_value_heads, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    attn = None
    fused_ok = cfg.attention_dropout <= 0 or dropout_rng is None
    # INVARIANT (fullk/flash): both fused kernels ignore mask_bias and are
    # correct only for causal attention over RIGHT-padded batches (padding
    # keys are masked a posteriori by the loss's -100 labels; padding
    # queries never attend to real keys ahead of them). The training
    # pipeline right-pads by construction (data/sft.py; checked once per
    # trainer in trainer.train_step); left-padded generation uses the
    # masked einsum/decode paths, never this dispatch.
    if attn_impl == "fullk" and fused_ok:
        attn = _fullk_attention(q, k, v)  # None = mesh doesn't divide shape
    elif attn_impl == "flash" and fused_ok:
        attn = _flash_attention(q, k, v)
    if attn is None:
        attn = _attention(q, k, v, mask_bias,
                          dropout_rate=cfg.attention_dropout,
                          dropout_rng=dropout_rng)
    x = x + _lin(lp, attn, "o_proj", linear, layer_idx)

    h = _rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    gate = _lin(lp, h, "gate_proj", linear, layer_idx)
    up = _lin(lp, h, "up_proj", linear, layer_idx)
    x = x + _lin(lp, jax.nn.silu(gate) * up, "down_proj", linear, layer_idx)
    return x


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def forward(params: Mapping[str, Any], input_ids: jax.Array, cfg: LlamaConfig,
            attention_mask: Optional[jax.Array] = None,
            positions: Optional[jax.Array] = None,
            linear=default_linear,
            remat: bool = True,
            activation_taps: Optional[dict] = None,
            stop_grad_below_layer: Optional[int] = None,
            attn_impl: str = "einsum",
            return_hidden: bool = False,
            dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Run the decoder; returns logits (B, S, V) in fp32.

    `linear(x, w, module_name, layer_idx)` is the linear dispatch hook — the
    trainer closes a sparse implementation over the SMT plan + trainable
    blocks. `activation_taps`, when given a dict, receives the fp32 |input|
    sums per target linear (the channel-saliency statistic — replaces the
    reference's Catcher/forward-hook machinery, fine_tune.py:586-708).

    `stop_grad_below_layer`: cut the backward graph at the input of this
    layer. Torch-autograd parity: in the reference, layers whose params all
    have requires_grad=False below the lowest selected layer never get a
    backward pass (autograd prunes the subgraph); XLA needs the explicit
    stop_gradient to DCE the same work.
    """
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.cumsum(attention_mask, axis=-1) - 1
        positions = jnp.maximum(positions, 0)

    x = jnp.take(params["embed_tokens"], input_ids, axis=0)

    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, :, :] & (attention_mask[:, None, :] > 0)
    mask_bias = jnp.where(keep, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]

    cos, sin = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    if activation_taps is not None:
        linear = _tapped(linear, activation_taps, attention_mask)

    attn_impl = resolve_attn_impl(attn_impl, s, cfg.head_dim)

    layer_fn = _decoder_layer
    if remat and activation_taps is None:
        layer_fn = jax.checkpoint(_decoder_layer,
                                  static_argnums=(5, 6, 7, 8),
                                  policy=jax.checkpoint_policies.nothing_saveable)

    for i in range(cfg.num_hidden_layers):
        if stop_grad_below_layer is not None and i == stop_grad_below_layer:
            x = jax.lax.stop_gradient(x)
        layer_rng = (jax.random.fold_in(dropout_rng, i)
                     if dropout_rng is not None else None)
        x = layer_fn(params["layers"][str(i)], x, mask_bias, cos, sin, cfg,
                     linear, i, attn_impl, dropout_rng=layer_rng)

    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x  # pre-head states for the fused chunked-vocab loss
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum("bsd,vd->bsv", x, head).astype(jnp.float32)
    return logits


def lm_head_weight(params: Mapping[str, Any], cfg: LlamaConfig) -> jax.Array:
    return params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]


def forward_scan(params: Mapping[str, Any], input_ids: jax.Array,
                 cfg: LlamaConfig, *,
                 layer_xs=None,
                 linear_scan=None,
                 attention_mask: Optional[jax.Array] = None,
                 positions: Optional[jax.Array] = None,
                 remat: bool = False,
                 stop_grad_below_layer: Optional[int] = None,
                 attn_impl: str = "einsum",
                 return_hidden: bool = False,
                 dropout_rng: Optional[jax.Array] = None,
                 activation_taps: Optional[dict] = None,
                 tap_reduce=None) -> jax.Array:
    """forward() with the layer loop as ONE lax.scan over stacked layer
    params — the training-side sibling of the scan decode path
    (forward_with_cache stacked=True). Compile time becomes depth-
    independent: one traced layer body instead of L copies (measured: the
    unrolled 32-layer sparse step compiles ~16 min on the v5e tunnel; the
    scan form compiles like a 1-layer model).

    params: non-layer leaves + "layers_stacked" {module: (L, ...)} (see
    stack_layers). layer_xs: optional extra pytree with leading-L leaves,
    sliced per scan step and handed to `linear_scan(x, w, module, ex)` —
    the scan-side sparse dispatch (per-layer trainable blocks / coords /
    int8 base live here; coordinates are traced, ops/sparse_linear.py
    smt_linear_dyn). Dropout: per-layer keys are folded from dropout_rng
    with the ABSOLUTE layer index scanned in as an xs leaf — the identical
    fold_in stream the unrolled forward uses, so scan/unrolled dropout
    runs agree exactly at equal seeds (tests/test_scan_phase.py dropout
    rows).

    activation_taps: like forward()'s — but inside a scan the taps cannot
    be written to an outer dict (they would leak scan tracers), so each
    layer's (S, in_dim) masked |input| sums become scan ys, stacked to
    {module: (L, ...)} and written into the caller's dict after the scan.
    tap_reduce(module, tap) optionally reduces each layer's tap INSIDE the
    body (e.g. select.channel_stats -> (C,)) so the stacked ys stay tiny —
    (L, S, C) raw stacks are ~0.5 GB/module at 8B depth; reduced stats are
    (L, C). Returning None from tap_reduce drops that module from the ys.

    stop_grad_below_layer is honored with the unrolled form's perf
    semantics too (torch-autograd parity P18): the scan splits statically
    into a frozen-prefix scan (layers [0, cut), output stop-gradiented —
    no cotangent ever enters it, so XLA DCEs its entire backward and
    residual saves) and a trainable-suffix scan over the rest. A single
    scan can't do this (the stop flag is data inside the body, so the
    transpose computes — then zeroes — every layer's backward)."""
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.cumsum(attention_mask, axis=-1) - 1
        positions = jnp.maximum(positions, 0)

    x = jnp.take(params["embed_tokens"], input_ids, axis=0)

    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, :, :] & (attention_mask[:, None, :] > 0)
    mask_bias = jnp.where(keep, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]

    cos, sin = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    attn_impl = resolve_attn_impl(attn_impl, s, cfg.head_dim)

    layer_fn = _decoder_layer
    # taps disable remat like the unrolled forward (the replayed forward
    # would re-write — and double — the tapped sums)
    if remat and activation_taps is None:
        layer_fn = jax.checkpoint(_decoder_layer,
                                  static_argnums=(5, 6, 7, 8),
                                  policy=jax.checkpoint_policies.nothing_saveable)

    n_layers = cfg.num_hidden_layers
    # cut == k means "stop_gradient at the entry of layer k" (k == 0 still
    # cuts embedding grads, matching the unrolled form); k >= L disables it
    cut = None
    if stop_grad_below_layer is not None and stop_grad_below_layer < n_layers:
        cut = max(0, int(stop_grad_below_layer))

    xs = {"lp": params["layers_stacked"]}
    if layer_xs is not None:
        xs["ex"] = layer_xs
    if dropout_rng is not None:
        # absolute layer indices -> the same fold_in stream as unrolled
        xs["li"] = jnp.arange(n_layers, dtype=jnp.int32)

    def body(x, xs_l):
        if linear_scan is not None:
            ex = xs_l["ex"]

            def linear(h, w, module, layer_idx):
                del layer_idx
                return linear_scan(h, w, module, ex)
        else:
            linear = default_linear
        taps_l: dict = {}
        if activation_taps is not None:
            linear = _tapped(linear, taps_l, attention_mask)
        layer_rng = (jax.random.fold_in(dropout_rng, xs_l["li"])
                     if dropout_rng is not None else None)
        x = layer_fn(xs_l["lp"], x, mask_bias, cos, sin, cfg, linear, 0,
                     attn_impl, dropout_rng=layer_rng)
        ys = None
        if activation_taps is not None:
            ys = {}
            for k, v in taps_l.items():
                mod = k.split(".", 1)[1]  # body layer_idx is always 0
                r = tap_reduce(mod, v) if tap_reduce is not None else v
                if r is not None:
                    ys[mod] = r
        return x, ys

    if cut is None:
        x, ys_all = jax.lax.scan(body, x, xs)
    else:
        ys_pre = None
        if cut > 0:
            xs_pre = jax.tree.map(lambda a: a[:cut], xs)
            x, ys_pre = jax.lax.scan(body, x, xs_pre)
        x = jax.lax.stop_gradient(x)
        xs_suf = jax.tree.map(lambda a: a[cut:], xs)
        x, ys_suf = jax.lax.scan(body, x, xs_suf)
        ys_all = (jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                               ys_pre, ys_suf)
                  if ys_pre is not None else ys_suf)
    if activation_taps is not None:
        activation_taps.update(ys_all)  # {module: (L, ...)}

    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    return jnp.einsum("bsd,vd->bsv", x, head).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache forward (generation)
# ---------------------------------------------------------------------------

def init_cache(cfg: LlamaConfig, batch_size: int, max_len: int,
               dtype=jnp.bfloat16, stacked: bool = False):
    """K/V ring buffers: per-layer dicts (B, max_len, Hkv, hd), or a single
    stacked {"k"/"v": (L, B, max_len, Hkv, hd)} pair for the scan-over-layers
    decode path.

    dtype int8 builds the QUANTIZED cache layout instead: int8 k/v plus
    per-(slot, head) fp32 "ks"/"vs" scale leaves, stored TRANSPOSED as
    (..., Hkv, max_len) so the cached-attention kernel can take them as
    (1, S) lane blocks (Mosaic rejects lane dims < 128). Long-context
    decode reads the whole cache every step, so the int8 form halves that
    HBM traffic and doubles the context that fits a chip; new slots are
    quantized symmetrically per head at write time and dequantized at
    attention — in-kernel via score/prob column scales on the TPU path
    (ops/pallas/cached_attention.py), in-register on the einsum fallback.
    The reference has no KV-cache story at all (eval reloads HF generate)."""
    hd = cfg.head_dim
    # K/V stored (B, Hkv, S, hd): Mosaic constrains the LAST TWO dims of a
    # pallas block, so the kernel's per-kv-head full-S blocks need Hkv
    # ahead of (S, hd); scales get a singleton sublane dim for the same
    # reason ((1, S) lane blocks)
    shape = (batch_size, cfg.num_key_value_heads, max_len, hd)
    sshape = (batch_size, cfg.num_key_value_heads, 1, max_len)
    if stacked:
        shape = (cfg.num_hidden_layers,) + shape
        sshape = (cfg.num_hidden_layers,) + sshape
    if jnp.dtype(dtype) == jnp.int8:
        def one():
            return {"k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "ks": jnp.zeros(sshape, jnp.float32),
                    "vs": jnp.zeros(sshape, jnp.float32)}
    else:
        def one():
            return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if stacked:
        return one()
    return {str(i): one() for i in range(cfg.num_hidden_layers)}


def stack_layers(params: Mapping[str, Any], cfg: LlamaConfig) -> Dict:
    """Re-layout params for the scan-over-layers decode: per-layer dicts ->
    one (L, ...) stacked tensor per module. One compiled scan body replaces
    L unrolled layer bodies, cutting decode compile time ~Lx (the eval
    harness compiles per prompt-length bucket; at 32-80 layers the unrolled
    program is minutes per bucket)."""
    layers = params["layers"]
    n = cfg.num_hidden_layers
    keys = layers["0"].keys()
    stacked = {k: jnp.stack([layers[str(i)][k] for i in range(n)]) for k in keys}
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def cache_batch_axis(params: Mapping[str, Any]) -> int:
    """Axis of the batch dim in KV-cache leaves (beam reorders along it)."""
    return 1 if "layers_stacked" in params else 0


def _quant_kv(t):
    """Symmetric per-(slot, head) int8 quantization of a K/V slice in
    cache axes (B, Hkv, S_new, hd) -> (int8 values, fp32 scales
    (B, Hkv, 1, S_new) — the kernel-facing storage layout, init_cache)."""
    t32 = t.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(t32), axis=-1, keepdims=True) / 127.0,
                    1e-10)
    # values already (B, Hkv, S_new, hd); scales -> (B, Hkv, 1, S_new)
    return (jnp.round(t32 / s).astype(jnp.int8),
            s[..., 0][:, :, None, :])


def _kv_write(kv, k, v, cache_index, stack_layer=None):
    """Write the new K/V slice (quantizing when the cache layout is int8).
    kv: per-layer buffers, or full (L, ...) stacks when stack_layer is a
    traced layer index (the cache-as-scan-carry form: only the new slot is
    written, so XLA updates the carried stack in place — per-layer xs/ys
    caches cost a slice + a write-back copy of the WHOLE layer buffer per
    step, ~110us/layer at p1024, the dominant long-context decode cost)."""
    if stack_layer is None:
        at = (0, 0, cache_index, 0)      # K/V: (B, Hkv, S, hd)
        sat = (0, 0, 0, cache_index)     # scales: (B, Hkv, 1, S)
        lift = lambda t: t
    else:
        at = (stack_layer, 0, 0, cache_index, 0)
        sat = (stack_layer, 0, 0, 0, cache_index)
        lift = lambda t: t[None]
    k = k.transpose(0, 2, 1, 3)          # (B, s_new, Hkv, hd) -> cache axes
    v = v.transpose(0, 2, 1, 3)
    if "ks" in kv:
        ki, ks_new = _quant_kv(k)
        vi, vs_new = _quant_kv(v)
        return {"k": jax.lax.dynamic_update_slice(kv["k"], lift(ki), at),
                "v": jax.lax.dynamic_update_slice(kv["v"], lift(vi), at),
                "ks": jax.lax.dynamic_update_slice(kv["ks"], lift(ks_new),
                                                   sat),
                "vs": jax.lax.dynamic_update_slice(kv["vs"], lift(vs_new),
                                                   sat)}
    return {"k": jax.lax.dynamic_update_slice(
                kv["k"], lift(k.astype(kv["k"].dtype)), at),
            "v": jax.lax.dynamic_update_slice(
                kv["v"], lift(v.astype(kv["v"].dtype)), at)}


def _kv_read(kv, q_dtype, x_dtype, stack_layer=None):
    """Dequantized (k_all, v_all) for the EINSUM fallback attention; with
    stack_layer, slice layer `stack_layer` out of the carried stacks (the
    slice feeds only elementwise casts + the attention dots, which XLA
    fuses — no materialised copy)."""
    if stack_layer is None:
        k, v = kv["k"], kv["v"]
        ks, vs = kv.get("ks"), kv.get("vs")
    else:
        pick = lambda t: jax.lax.dynamic_index_in_dim(t, stack_layer, 0,
                                                      keepdims=False)
        k, v = pick(kv["k"]), pick(kv["v"])
        ks = pick(kv["ks"]) if "ks" in kv else None
        vs = pick(kv["vs"]) if "vs" in kv else None
    k_all = k.astype(q_dtype)            # (B, Hkv, S, hd)
    v_all = v.astype(x_dtype)
    if ks is not None:
        # scales (B, Hkv, 1, S) -> (B, Hkv, S, 1), broadcast over hd
        k_all = k_all * ks[..., 0, :][..., None].astype(q_dtype)
        v_all = v_all * vs[..., 0, :][..., None].astype(x_dtype)
    return k_all, v_all


# test hook: force the cached-attention kernel (interpret mode) off-TPU
_FORCE_CACHED_ATTN = False

# auto-policy slot threshold: median-of-3 A/B on the v5e (8B geometry,
# SMT_CACHED_ATTN switch) — einsum decode 11.3/10.8/12.2 ms/step at
# 256/1024/2048 slots vs kernel 14.0/11.9/6.9: the kernel's per-program
# grid overhead (B*Hkv programs x L layers) dominates below ~2k slots
# where the einsum's materialised scores are still small, and the kernel
# wins past it (scores never in HBM + in-kernel int8 dequant).
CACHED_ATTN_MIN_SLOTS = 2048


def _use_cached_attn(cfg: LlamaConfig, max_len: int) -> bool:
    import os
    from sparse_matrix_tuning_tpu.ops.pallas.cached_attention import supported
    mode = os.environ.get("SMT_CACHED_ATTN", "auto")  # auto|on|off (A/B)
    if mode == "off":
        return False
    if not supported(cfg.head_dim, max_len, cfg.num_attention_heads,
                     cfg.num_key_value_heads):
        return False
    if _FORCE_CACHED_ATTN or mode == "on":
        return True
    return (jax.devices()[0].platform == "tpu"
            and max_len >= CACHED_ATTN_MIN_SLOTS)


def _cached_layer(lp, x, kv_old, cache_index, mask_bias, cos, sin,
                  cfg: LlamaConfig, linear, layer_idx: int,
                  stack_layer=None, slot_mask=None):
    """One decoder layer in incremental-decode form; returns (x, kv_new).

    kv_old: {"k","v"} ring buffers, plus {"ks","vs"} per-(slot, head) fp32
    scales when the cache is int8-quantized (init_cache dtype int8) — the
    cache READ is then half the bytes and the dense K/V tiles exist only
    in-register after the fused dequant. With stack_layer (a traced layer
    index), kv_old holds the FULL (L, ...) stacks carried through the
    layer scan (see _kv_write).

    Attention runs in the cached-attention Pallas kernel when shapes
    conform and slot_mask is given (scores stay VMEM-only, mask computed
    in-kernel — ops/pallas/cached_attention.py); the masked einsum is the
    exact fallback."""
    b, s_new, _ = x.shape
    h = _rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    q = _lin(lp, h, "q_proj", linear, layer_idx).reshape(
        b, s_new, cfg.num_attention_heads, cfg.head_dim)
    k = _lin(lp, h, "k_proj", linear, layer_idx).reshape(
        b, s_new, cfg.num_key_value_heads, cfg.head_dim)
    v = _lin(lp, h, "v_proj", linear, layer_idx).reshape(
        b, s_new, cfg.num_key_value_heads, cfg.head_dim)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    kv = _kv_write(kv_old, k, v, cache_index, stack_layer)
    max_len = kv["k"].shape[-2]

    if slot_mask is not None and _use_cached_attn(cfg, max_len):
        from sparse_matrix_tuning_tpu.ops.pallas.cached_attention import (
            cached_attention)
        attn = cached_attention(q, kv, slot_mask, cache_index,
                                layer=stack_layer)
        attn = attn.astype(x.dtype).reshape(b, s_new, -1)
    else:
        k_all, v_all = _kv_read(kv, q.dtype, x.dtype, stack_layer)
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        groups = hq // hkv
        qg = q.reshape(b, s_new, hkv, groups, cfg.head_dim)
        scores = jnp.einsum("bqkgd,bksd->bkgqs", qg,
                            k_all).astype(jnp.float32)
        scores = (scores / np.sqrt(cfg.head_dim)
                  + mask_bias[:, None, None, :, :])
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bkgqs,bksd->bqkgd", probs, v_all)
        attn = attn.reshape(b, s_new, -1)
    x = x + _lin(lp, attn, "o_proj", linear, layer_idx)

    h = _rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    gate = _lin(lp, h, "gate_proj", linear, layer_idx)
    up = _lin(lp, h, "up_proj", linear, layer_idx)
    x = x + _lin(lp, jax.nn.silu(gate) * up, "down_proj", linear, layer_idx)
    return x, kv


def forward_with_cache(params: Mapping[str, Any], input_ids: jax.Array,
                       cfg: LlamaConfig, cache, cache_index,
                       slot_mask: jax.Array, positions: jax.Array,
                       linear=default_linear, last_only: bool = False):
    """Incremental forward: write K/V for `input_ids` (B, S_new) at slots
    [cache_index, cache_index+S_new), attend over the whole cache gated by
    `slot_mask` (B, max_len; must already include the new tokens' slots),
    with RoPE at per-example `positions` (B, S_new). Returns (logits, cache).

    last_only=True emits logits for the LAST position only, (B, 1, V) —
    the prefill case (left padding puts the last real token at slot -1):
    full-prompt logits are b*s*V fp32 (8.4 GB at 8B/V=128k/s=2048 — an
    instant OOM on one chip) and ~s times the head FLOPs, all discarded.

    Accepts either per-layer params (python loop; supports the `linear`
    dispatch hook) or `stack_layers` output (single lax.scan body — one
    layer's compile cost regardless of depth; dense linears only).
    """
    b, s_new = input_ids.shape
    max_len = slot_mask.shape[1]
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    cos, sin = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    # slot j is visible to new token i iff slot_mask[b, j] and j <= cache_index + i
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 1)
    new_ids = jax.lax.broadcasted_iota(jnp.int32, (s_new, max_len), 0)
    causal = slot_ids <= (cache_index + new_ids)
    keep = causal[None] & (slot_mask[:, None, :] > 0)
    mask_bias = jnp.where(keep, 0.0, jnp.finfo(jnp.float32).min)  # (B, S_new, max_len)

    if "layers_q8" in params:
        # int8 scan decode: generation straight from the scan training
        # state — the frozen base stays int8 on device (the dense bf16
        # weights may never have existed on this chip, see host offload /
        # quantize-on-load) and the selected blocks/columns see their exact
        # trained values via the same delta corrections the training
        # forward used (ops/sparse_linear.smt_linear_dyn). This is what
        # lets an 8B model TRAINED on one 16G chip also run its generation
        # eval there. Corrections use the sequential XLA chain ("oracle"):
        # decode rows (B or B*beams) are far below the Pallas kernels' tile
        # sizes.
        from sparse_matrix_tuning_tpu.train.scan_phase import (
            make_scan_dispatch)
        ex_tree = params["layers_q8"]
        idx = ex_tree.get("idx", {})
        mode = ("channel" if any("ci" in m for m in idx.values())
                else "matrix")
        lin_scan = make_scan_dispatch("oracle", mode)
        # int4 modules with the stacked-kernel layout (w4p/slt/sht, built
        # by decode_params_from_scan) must NOT ride as scanned xs: the
        # per-layer slice feeding a pallas custom call materialises a full
        # weight copy every step (~1.45 ms/step at L=8, profiled). They
        # close over the scan and the kernel indexes the stack at the
        # scanned layer index via scalar prefetch.
        q_all = ex_tree.get("q", {})
        q4_stacks = {m: {"w4s": q["w4p"], "slt": q["slt"], "sht": q["sht"],
                         "s4s": q["s4"]}
                     for m, q in q_all.items() if "w4p" in q}
        ex_scan = {k: v for k, v in ex_tree.items() if k != "q"}
        ex_scan["q"] = {m: q for m, q in q_all.items() if "w4p" not in q}
        n_layers = cfg.num_hidden_layers

        # cache rides as the scan CARRY (full stacks, in-place slot
        # updates), NOT as xs/ys: per-layer xs slicing + ys write-back
        # copies the whole layer cache twice per step (~110us/layer at
        # p1024 — profiled, tools/decode_profile.py).
        def body(carry, scanned):
            x, kvc = carry
            lp, ex, l = scanned
            ex = dict(ex)
            ex["q4s"] = q4_stacks
            ex["l"] = l
            lin = lambda xx, w, module, li: lin_scan(xx, w, module, ex)
            x, kvc = _cached_layer(lp, x, kvc, cache_index,
                                   mask_bias, cos, sin, cfg, lin, 0,
                                   stack_layer=l, slot_mask=slot_mask)
            return (x, kvc), None

        (x, new_cache), _ = jax.lax.scan(
            body, (x, cache),
            (params["layers_stacked"], ex_scan,
             jnp.arange(n_layers, dtype=jnp.int32)))
    elif "layers_stacked" in params:
        assert linear is default_linear, \
            "scan-over-layers decode supports dense linears only"

        def body(carry, scanned):
            x, kvc = carry
            lp, l = scanned
            x, kvc = _cached_layer(lp, x, kvc, cache_index,
                                   mask_bias, cos, sin, cfg,
                                   default_linear, 0, stack_layer=l,
                                   slot_mask=slot_mask)
            return (x, kvc), None

        (x, new_cache), _ = jax.lax.scan(
            body, (x, cache),
            (params["layers_stacked"],
             jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)))
    else:
        new_cache = {}
        for i in range(cfg.num_hidden_layers):
            li = str(i)
            x, kv = _cached_layer(params["layers"][li], x, cache[li],
                                  cache_index, mask_bias, cos, sin, cfg,
                                  linear, i, slot_mask=slot_mask)
            new_cache[li] = kv

    if last_only:
        x = x[:, -1:, :]
    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.einsum("bsd,vd->bsv", x, head).astype(jnp.float32)
    return logits, new_cache


def _tapped(linear, taps: dict, attention_mask: jax.Array):
    """Wrap the linear dispatch to record sum_batch |input| (masked) per
    target linear — the channel-saliency statistic. Output shape per tap:
    (S, in_dim), matching the reference's accumulated activation after its
    sum over dim 0 (smt_helper.py:169)."""
    def tapped(x, w, module, layer_idx):
        if module in TARGET_MODULES:
            m = attention_mask[..., None].astype(jnp.float32)
            taps[f"{layer_idx}.{module}"] = jnp.sum(jnp.abs(x.astype(jnp.float32)) * m, axis=0)
        return linear(x, w, module, layer_idx)
    return tapped


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

IGNORE_INDEX = -100  # reference helper.py:23


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """HF-style shifted cross-entropy, mean over non-ignored tokens, fp32."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_loss = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    tok_loss = jnp.where(valid, tok_loss, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return tok_loss.sum() / denom


def loss_fn(params, batch, cfg: LlamaConfig, linear=default_linear, remat=True):
    logits = forward(params, batch["input_ids"], cfg,
                     attention_mask=batch.get("attention_mask"),
                     linear=linear, remat=remat)
    return causal_lm_loss(logits, batch["labels"])
