"""HF interop edge cases: tied embeddings, Mistral config mapping, bias
roundtrip through save/load, sharded load of bias checkpoints."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.hf_io import (
    load_hf_config, load_hf_params, save_hf_format,
)
from sparse_matrix_tuning_tpu.models.llama import (
    LlamaConfig, causal_lm_loss, forward, init_params,
)


def test_tied_embeddings_roundtrip(tmp_path):
    cfg = LlamaConfig.tiny()
    cfg = LlamaConfig(**{**cfg.__dict__, "tie_word_embeddings": True})
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "lm_head" not in params
    logits = forward(params, jnp.zeros((1, 4), jnp.int32), cfg)
    assert logits.shape[-1] == cfg.vocab_size

    save_hf_format(params, cfg, str(tmp_path))
    # exported file must not contain lm_head
    from safetensors import safe_open
    with safe_open(str(tmp_path / "model.safetensors"), framework="np") as f:
        assert "lm_head.weight" not in list(f.keys())
    cfg2 = load_hf_config(str(tmp_path))
    assert cfg2.tie_word_embeddings
    params2 = load_hf_params(str(tmp_path), cfg2, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(params2["embed_tokens"]),
                                  np.asarray(params["embed_tokens"]))


def test_mistral_config_maps(tmp_path):
    hf = {
        "model_type": "mistral", "vocab_size": 1000, "hidden_size": 128,
        "intermediate_size": 256, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 4096, "sliding_window": 4096,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf))
    cfg = load_hf_config(str(tmp_path))
    assert cfg.hidden_size == 128 and cfg.num_key_value_heads == 2


def test_bias_export_roundtrip(tmp_path):
    cfg = LlamaConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    params["layers"]["0"]["q_proj_bias"] = jnp.arange(256, dtype=jnp.float32)
    save_hf_format(params, cfg, str(tmp_path))
    from safetensors import safe_open
    with safe_open(str(tmp_path / "model.safetensors"), framework="np") as f:
        assert "model.layers.0.self_attn.q_proj.bias" in list(f.keys())
    params2 = load_hf_params(str(tmp_path), cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(params2["layers"]["0"]["q_proj_bias"]), np.arange(256))


def test_generate_fn_bucketing():
    """make_generate_fn pads prompt batches to power-of-two buckets and
    handles ragged final chunks."""
    from sparse_matrix_tuning_tpu.eval.generate import GenerationConfig
    from sparse_matrix_tuning_tpu.eval.harness import make_generate_fn

    cfg = LlamaConfig.tiny(vocab_size=300)
    params = init_params(jax.random.PRNGKey(0), cfg)

    class FakeTok:
        pad_token_id = 0

        def __call__(self, prompts, truncation=True, max_length=512,
                     return_attention_mask=True):
            return {"input_ids": [[5] * (3 + len(p) % 7) for p in prompts]}

        def batch_decode(self, tokens, skip_special_tokens=True):
            return [" ".join(map(str, np.asarray(t))) for t in tokens]

    gen = GenerationConfig(max_new_tokens=4, num_beams=1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32")
    fn = make_generate_fn(params, cfg, FakeTok(), gen, batch_size=4)
    outs = fn(["a" * i for i in range(6)])  # 6 prompts, batch 4 -> ragged tail
    assert len(outs) == 6
    assert all(isinstance(o, str) for o in outs)
