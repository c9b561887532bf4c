"""Model numerics: our pure-JAX Llama vs HF transformers (torch CPU).

The reference gets its model from HF (deepspeed_helpers.py:590-624); our
decoder must match it bit-for-bit-ish in fp32 so selection/accuracy parity
claims are meaningful.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import (
    LlamaConfig, causal_lm_loss, forward, init_params, target_module_dims,
)
from sparse_matrix_tuning_tpu.models.hf_io import (
    load_hf_config, load_hf_params, save_hf_format,
)

CFG = LlamaConfig.tiny()


def test_forward_shapes_and_dtype():
    params = init_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.zeros((2, 8), jnp.int32)
    logits = forward(params, ids, CFG)
    assert logits.shape == (2, 8, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_target_module_dims():
    params = init_params(jax.random.PRNGKey(0), CFG)
    dims = target_module_dims(params)
    assert dims["q_proj"] == (256, 256)
    assert dims["k_proj"] == (128, 256)
    assert dims["gate_proj"] == (512, 256)
    assert dims["down_proj"] == (256, 512)


def test_loss_masks_ignore_index():
    params = init_params(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, CFG.vocab_size)
    logits = forward(params, ids, CFG)
    labels_all_ignored = jnp.full((2, 8), -100, jnp.int32)
    assert causal_lm_loss(logits, labels_all_ignored) == 0.0
    labels = ids.at[:, :4].set(-100)
    loss = causal_lm_loss(logits, labels)
    assert jnp.isfinite(loss) and loss > 0


@pytest.fixture(scope="module")
def hf_tiny(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    d = tmp_path_factory.mktemp("hf_tiny")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_logits_match_hf(hf_tiny):
    import torch
    model, d = hf_tiny
    cfg = load_hf_config(d)
    assert cfg == CFG
    params = load_hf_params(d, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0  # right padding

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg,
                             attention_mask=jnp.asarray(mask)))
    # compare only non-pad positions
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :9], ref[1, :9], rtol=2e-4, atol=2e-4)


def test_loss_matches_hf(hf_tiny):
    import torch
    model, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (2, 10))
    labels = ids.copy()
    labels[:, :3] = -100
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    labels=torch.tensor(labels)).loss.item()
    logits = forward(params, jnp.asarray(ids), cfg)
    got = float(causal_lm_loss(logits, jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-4)


def test_hf_export_roundtrip(hf_tiny, tmp_path):
    _, d = hf_tiny
    cfg = load_hf_config(d)
    params = load_hf_params(d, cfg, dtype=jnp.float32)
    out = tmp_path / "export"
    save_hf_format(params, cfg, str(out))
    assert (out / "model.safetensors").exists()
    with open(out / "config.json") as f:
        assert json.load(f)["model_type"] == "llama"
    params2 = load_hf_params(str(out), cfg, dtype=jnp.float32)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(params, params2)

    # and transformers can load it back
    import torch
    from transformers import AutoModelForCausalLM
    m2 = AutoModelForCausalLM.from_pretrained(str(out), torch_dtype=torch.float32)
    assert m2.config.hidden_size == cfg.hidden_size
