"""Cached-attention Pallas kernel (ops/pallas/cached_attention.py) vs the
masked-einsum oracle (models/llama._cached_layer fallback semantics):

  * causal + left-pad slot masking from (slot_mask, cache_index) iota math;
  * GQA head grouping (token-major rows);
  * per-layer and stacked (scalar-prefetch layer index) cache forms;
  * int8 cache: column-scale dequant == explicit dequant then attention;
  * in-model: _FORCE_CACHED_ATTN routes _cached_layer through the kernel
    and generation output matches the einsum path.

All kernel invocations run in interpret mode on CPU (conftest pins cpu).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.pallas.cached_attention import (
    cached_attention, supported)

B, T, HQ, HKV, HD, S = 2, 9, 8, 4, 128, 256


def _mk(seed=0, t=T, quant=False, layers=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, t, HQ, HD)), jnp.float32)
    lshape = (layers,) if layers else ()
    # cache storage layout: (..., Hkv, S, hd); scales (..., Hkv, 1, S)
    k = rng.standard_normal(lshape + (B, HKV, S, HD)).astype(np.float32)
    v = rng.standard_normal(lshape + (B, HKV, S, HD)).astype(np.float32)
    sm = np.zeros((B, S), np.int32)
    sm[0, 3:40] = 1   # left-padded example
    sm[1, 0:37] = 1
    kv = {}
    if quant:
        ks = np.abs(k).max(-1) / 127.0 + 1e-10        # (..., Hkv, S)
        vs = np.abs(v).max(-1) / 127.0 + 1e-10
        kv["k"] = jnp.asarray(np.round(k / ks[..., None]), jnp.int8)
        kv["v"] = jnp.asarray(np.round(v / vs[..., None]), jnp.int8)
        kv["ks"] = jnp.asarray(ks[..., None, :], jnp.float32)
        kv["vs"] = jnp.asarray(vs[..., None, :], jnp.float32)
    else:
        kv["k"] = jnp.asarray(k, jnp.float32)
        kv["v"] = jnp.asarray(v, jnp.float32)
    return q, kv, jnp.asarray(sm)


def _dequant(kv, layer=None):
    k, v = np.asarray(kv["k"], np.float32), np.asarray(kv["v"], np.float32)
    if "ks" in kv:
        k = k * np.asarray(kv["ks"])[..., 0, :][..., None]
        v = v * np.asarray(kv["vs"])[..., 0, :][..., None]
    if layer is not None:
        k, v = k[layer], v[layer]
    return k, v


def _oracle(q, k_all, v_all, slot_mask, ci):
    """Masked-einsum reference (same math as llama._cached_layer).
    k_all/v_all in cache axes (B, Hkv, S, hd)."""
    b, t, hq, hd = q.shape
    hkv = k_all.shape[1]
    g = hq // hkv
    qg = np.asarray(q, np.float32).reshape(b, t, hkv, g, hd)
    scores = np.einsum("bqkgd,bksd->bkgqs", qg, k_all) / np.sqrt(hd)
    slots = np.arange(k_all.shape[2])
    toks = np.arange(t)
    keep = (slots[None, :] <= ci + toks[:, None])[None] & \
        (np.asarray(slot_mask)[:, None, :] > 0)
    scores = np.where(keep[:, None, None], scores,
                      np.finfo(np.float32).min)
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bkgqs,bksd->bqkgd", p, v_all)
    return out.reshape(b, t, hq, hd)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("t,ci", [(1, 39), (9, 20), (17, 0)])
def test_kernel_matches_oracle(quant, t, ci):
    q, kv, sm = _mk(seed=t + 10 * quant, t=t, quant=quant)
    got = cached_attention(q, kv, sm, ci, interpret=True)
    want = _oracle(q, *_dequant(kv), sm, ci)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("quant", [False, True])
def test_stacked_layer_indexing(quant):
    L = 3
    q, kv, sm = _mk(seed=7, t=1, quant=quant, layers=L)
    for l in range(L):
        got = cached_attention(q, kv, sm, 38, layer=jnp.int32(l),
                               interpret=True)
        want = _oracle(q, *_dequant(kv, layer=l), sm, 38)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-3, err_msg=f"layer {l}")


def test_supported_gating():
    assert supported(128, 256, 8, 4)
    assert not supported(64, 256, 8, 4)      # lane-dim head
    assert not supported(128, 250, 8, 4)     # unaligned slot count
    assert supported(256, 512, 4, 4)


def test_in_model_kernel_matches_einsum(monkeypatch):
    """_cached_layer routed through the kernel (via _FORCE_CACHED_ATTN)
    produces the same prefill logits as the einsum fallback (tolerance =
    accumulation-order noise), bf16/int8 cache, per-layer and stacked."""
    from sparse_matrix_tuning_tpu.eval.generate import prepare_decode_params
    from sparse_matrix_tuning_tpu.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512)   # head_dim 128 -> kernel-conformant
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    stacked = prepare_decode_params(params, cfg)
    rng = np.random.default_rng(3)
    ids = np.zeros((2, 12), np.int32)
    mask = np.zeros((2, 12), np.int32)
    for i, L in enumerate((7, 11)):
        ids[i, 12 - L:] = rng.integers(3, 500, L)
        mask[i, 12 - L:] = 1
    MAXLEN = 128   # kernel gating needs max_len % 128 == 0

    def prefill(p, cache_dtype):
        stacked_p = "layers_stacked" in p
        cache = llama.init_cache(cfg, 2, MAXLEN, dtype=jnp.dtype(cache_dtype),
                                 stacked=stacked_p)
        sm = np.zeros((2, MAXLEN), np.int32)
        sm[:, :12] = mask
        positions = np.maximum(mask.cumsum(-1) - 1, 0)
        logits, _ = llama.forward_with_cache(
            p, jnp.asarray(ids), cfg, cache, 0, jnp.asarray(sm),
            jnp.asarray(positions))
        return np.asarray(logits)

    legs = [(p, cd) for p in (params, stacked)
            for cd in ("float32", "int8")]
    base = [prefill(p, cd) for p, cd in legs]
    assert llama._use_cached_attn(cfg, MAXLEN) is False  # CPU: einsum path
    monkeypatch.setattr(llama, "_FORCE_CACHED_ATTN", True)
    assert llama._use_cached_attn(cfg, MAXLEN) is True
    kern = [prefill(p, cd) for p, cd in legs]
    for (b_leg, k_leg), (_, cd) in zip(zip(base, kern), legs):
        np.testing.assert_allclose(k_leg, b_leg, rtol=2e-3, atol=2e-3,
                                   err_msg=f"cache {cd}")
