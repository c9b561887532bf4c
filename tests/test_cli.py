"""Full-pipeline CLI tests: fine_tune entry on a local tiny HF checkpoint +
alpaca-style JSON, then the generation-eval entry on its export."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    """Local HF checkpoint dir: tiny Llama weights + a real fast tokenizer."""
    torch = pytest.importorskip("torch")
    from transformers import (LlamaConfig as HFConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = tmp_path_factory.mktemp("tiny_ckpt")

    corpus = ["Below is an instruction that describes a task.",
              "Write a response that appropriately completes the request.",
              "### Instruction: ### Response: true false solution1 solution2",
              "the quick brown fox jumps over the lazy dog"] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(corpus, trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<pad>", "<unk>", "<s>", "</s>"]))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>")
    fast.save_pretrained(d)

    hf_cfg = HFConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        attention_bias=False)
    torch.manual_seed(0)
    LlamaForCausalLM(hf_cfg).save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    examples = [
        {"instruction": f"Repeat the word fox number {i}",
         "output": "the quick brown fox"} for i in range(32)
    ]
    path = d / "train.json"
    path.write_text(json.dumps(examples))
    return str(path)


def test_fine_tune_cli_end_to_end(tiny_hf_dir, tiny_data, tmp_path):
    from sparse_matrix_tuning_tpu.cli.fine_tune import main
    out = tmp_path / "out"
    history = main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", tiny_data,
        "--output_dir", str(out),
        "--matrix_sparsity", "--full_ft_steps", "1",
        "--downsample_attention_blocks_ratio", "0.2",
        "--downsample_mlp_blocks_ratio", "0.2",
        "--per_device_ft_batch_size", "1",
        "--per_device_eval_batch_size", "1",
        "--num_ft_epochs", "1",
        "--max_seq_len", "64",
        "--eval_step", "2", "--dtype", "fp32",
        "--ft_learning_rate", "1e-3", "--smt_lr", "1e-3",
        "--no_gradient_checkpointing",
    ])
    assert len(history["train_loss"]) >= 3
    assert np.isfinite(history["train_loss"]).all()
    assert (out / "final" / "model.safetensors").exists()
    assert (out / "final" / "smt_plan.json").exists()
    assert (out / "final" / "tokenizer_config.json").exists()
    assert np.isfinite(history["eval_loss"]).all()


def test_eval_cli_on_export(tiny_hf_dir, tmp_path):
    # build a fake commonsense dataset dir and run the eval CLI on the raw model
    from sparse_matrix_tuning_tpu.cli.run_commonsense import main
    data_dir = tmp_path / "cs"
    (data_dir / "boolq").mkdir(parents=True)
    examples = [{"instruction": f"Is the sky blue? {i}", "answer": "true"}
                for i in range(4)]
    (data_dir / "boolq" / "test.json").write_text(json.dumps(examples))

    results = main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", str(data_dir),
        "--datasets", "boolq",
        "--output_dir", str(tmp_path / "eval_out"),
        "--per_device_eval_batch_size", "2",
        "--max_new_tokens", "8", "--num_beams", "2",
        "--dtype", "fp32",
    ])
    assert "boolq" in results
    preds = (tmp_path / "eval_out" / "boolq" / "model_predictions.jsonl")
    assert preds.exists()
    assert len(preds.read_text().strip().splitlines()) == 4
    assert (tmp_path / "eval_out" / "summary.json").exists()


def test_eval_cli_q8_quantize_on_load(tiny_hf_dir, tmp_path):
    """--frozen_quant int8: the checkpoint streams to device as int8 and
    decodes through the layers_q8 branch — the dense bf16 form never
    materialises (8B-on-16G eval). Same harness artifacts as the exact
    path, and predictions stay plausible text (extraction still runs)."""
    from sparse_matrix_tuning_tpu.cli.run_commonsense import main
    data_dir = tmp_path / "cs"
    (data_dir / "boolq").mkdir(parents=True)
    examples = [{"instruction": f"Is the sky blue? {i}", "answer": "true"}
                for i in range(3)]
    (data_dir / "boolq" / "test.json").write_text(json.dumps(examples))

    results = main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", str(data_dir),
        "--datasets", "boolq",
        "--output_dir", str(tmp_path / "eval_q8"),
        "--per_device_eval_batch_size", "2",
        "--max_new_tokens", "6", "--num_beams", "1",
        "--dtype", "fp32", "--frozen_quant", "int8",
    ])
    assert "boolq" in results
    preds = (tmp_path / "eval_q8" / "boolq" / "model_predictions.jsonl")
    assert len(preds.read_text().strip().splitlines()) == 3


def test_eval_cli_q4_quantize_on_load(tiny_hf_dir, tmp_path):
    """--frozen_quant int4: quantize-on-load to int8, then requantize the
    frozen base to the nibble-packed int4 layout (consume=True frees the
    int8 copy) — the decode capacity/bandwidth path. Harness artifacts
    match the q8 path's shape."""
    from sparse_matrix_tuning_tpu.cli.run_commonsense import main
    data_dir = tmp_path / "cs"
    (data_dir / "boolq").mkdir(parents=True)
    examples = [{"instruction": f"Is the sky blue? {i}", "answer": "true"}
                for i in range(3)]
    (data_dir / "boolq" / "test.json").write_text(json.dumps(examples))

    results = main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", str(data_dir),
        "--datasets", "boolq",
        "--output_dir", str(tmp_path / "eval_q4"),
        "--per_device_eval_batch_size", "2",
        "--max_new_tokens", "6", "--num_beams", "1",
        "--dtype", "fp32", "--frozen_quant", "int4",
    ])
    assert "boolq" in results
    preds = (tmp_path / "eval_q4" / "boolq" / "model_predictions.jsonl")
    assert len(preds.read_text().strip().splitlines()) == 3


def test_eval_cli_math_dataset(tiny_hf_dir, tmp_path):
    from sparse_matrix_tuning_tpu.cli.run_commonsense import main
    data_dir = tmp_path / "math"
    (data_dir / "gsm8k").mkdir(parents=True)
    examples = [{"instruction": f"What is {i}+{i}?", "answer": str(2 * i)}
                for i in range(1, 4)]
    (data_dir / "gsm8k" / "test.json").write_text(json.dumps(examples))

    results = main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", str(data_dir),
        "--datasets", "gsm8k",
        "--output_dir", str(tmp_path / "out"),
        "--per_device_eval_batch_size", "3",
        "--max_new_tokens", "8", "--num_beams", "1",
        "--dtype", "fp32",
    ])
    assert "gsm8k" in results
    preds = (tmp_path / "out" / "gsm8k" / "model_predictions.jsonl")
    assert len(preds.read_text().strip().splitlines()) == 3


def test_fine_tune_cli_sparse_from_plan(tiny_hf_dir, tiny_data, tmp_path):
    """--sparse_from_plan: quantize-on-load sparse continuation from a plan
    produced by a prior two-phase run (the single-chip big-model flow)."""
    from sparse_matrix_tuning_tpu.cli.fine_tune import main
    first = tmp_path / "first"
    main([
        "--model_name_or_path", tiny_hf_dir,
        "--data_path", tiny_data,
        "--output_dir", str(first),
        "--matrix_sparsity", "--full_ft_steps", "1",
        "--downsample_attention_blocks_ratio", "0.2",
        "--downsample_mlp_blocks_ratio", "0.2",
        "--per_device_ft_batch_size", "1",
        "--per_device_eval_batch_size", "1", "--num_ft_epochs", "1",
        "--max_seq_len", "64", "--eval_step", "0", "--dtype", "fp32",
        "--ft_learning_rate", "1e-3", "--smt_lr", "1e-3",
        "--no_gradient_checkpointing",
    ])
    plan_file = first / "final" / "smt_plan.json"
    assert plan_file.exists()

    out = tmp_path / "cont"
    history = main([
        "--model_name_or_path", str(first / "final"),
        "--data_path", tiny_data,
        "--output_dir", str(out),
        "--matrix_sparsity",
        "--sparse_from_plan", str(plan_file),
        "--frozen_quant", "int8",  # quantize-on-load is the int8 path
        "--per_device_ft_batch_size", "1",
        "--per_device_eval_batch_size", "1", "--num_ft_epochs", "1",
        "--max_seq_len", "64", "--eval_step", "2", "--dtype", "fp32",
        "--smt_lr", "1e-3", "--no_gradient_checkpointing",
    ])
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(history["eval_loss"]).all()
    assert (out / "final" / "model.safetensors").exists()


def test_arg_parser_policy_knobs():
    """The TPU policy knobs parse with their documented choices and land
    in SMTConfig; bad values are rejected by argparse."""
    import pytest
    from sparse_matrix_tuning_tpu.config import SMTConfig, build_arg_parser

    from sparse_matrix_tuning_tpu.config import parse_args
    p = build_arg_parser()
    cfg = parse_args([
        "--model_name_or_path", "m", "--data_path", "d.json",
        "--matrix_sparsity",
        "--frozen_quant", "int8", "--head_quant", "int8",
        "--scan_layers", "on", "--attn_impl", "einsum",
        "--loss_impl", "chunked", "--no_frozen_host_offload",
    ])
    assert cfg.frozen_quant == "int8" and cfg.head_quant == "int8"
    assert cfg.scan_layers == "on" and cfg.attn_impl == "einsum"
    assert cfg.loss_impl == "chunked" and not cfg.frozen_host_offload
    with pytest.raises(SystemExit):
        p.parse_args(["--model_name_or_path", "m", "--data_path", "d.json",
                      "--head_quant", "fp4"])


def test_eval_parser_kv_cache_knob():
    """--kv_cache parses (auto/exact/int8) and routes cache_dtype."""
    import pytest
    from sparse_matrix_tuning_tpu.cli.run_commonsense import build_parser
    p = build_parser()
    a = p.parse_args(["--model_name_or_path", "m", "--data_path", "d",
                      "--kv_cache", "int8"])
    assert a.kv_cache == "int8"
    assert build_parser().parse_args(
        ["--model_name_or_path", "m", "--data_path", "d"]).kv_cache == "auto"
    with pytest.raises(SystemExit):
        p.parse_args(["--model_name_or_path", "m", "--data_path", "d",
                      "--kv_cache", "fp8"])
