"""Family registry + Qwen2-style bias support."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.registry import resolve_family
from sparse_matrix_tuning_tpu.models.hf_io import load_hf_config, load_hf_params
from sparse_matrix_tuning_tpu.models.llama import forward


def test_registry():
    assert resolve_family("llama") == "llama"
    assert resolve_family("mistral") == "mistral"
    assert resolve_family("qwen2") == "qwen2"
    with pytest.raises(NotImplementedError, match="silently"):
        resolve_family("opt")
    with pytest.raises(NotImplementedError):
        resolve_family("gptzzz")


def test_qwen2_bias_logits_match_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg_hf = Qwen2Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_theta=10000.0)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg_hf).eval().to(torch.float32)
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_hf_config(str(tmp_path))
    params = load_hf_params(str(tmp_path), cfg, dtype=jnp.float32)
    # qwen2 ships q/k/v biases
    assert "q_proj_bias" in params["layers"]["0"]

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, (2, 10))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
