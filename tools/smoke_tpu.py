"""End-to-end CLI smoke on the real TPU chip: builds a local random-init
llama checkpoint (~200M) + BPE tokenizer + alpaca-style JSON, then runs
cli.fine_tune through warm-up -> conversion -> sparse phase -> eval ->
export. Not part of the test suite (needs the TPU); run manually:
  python tools/smoke_tpu.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def build_ckpt(d):
    import torch
    from transformers import (LlamaConfig as HFConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    corpus = ["Below is an instruction that describes a task.",
              "Write a response that appropriately completes the request.",
              "### Instruction: ### Response: true false answer1 answer2",
              "the quick brown fox jumps over the lazy dog",
              "counting one two three four five six seven eight nine ten"] * 100
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(corpus, trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<pad>", "<unk>", "<s>", "</s>"]))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>")
    fast.save_pretrained(d)

    hf_cfg = HFConfig(
        vocab_size=1024, hidden_size=1024, intermediate_size=2816,
        num_hidden_layers=8, num_attention_heads=16, num_key_value_heads=4,
        max_position_embeddings=2048, tie_word_embeddings=False,
        attention_bias=False)
    torch.manual_seed(0)
    LlamaForCausalLM(hf_cfg).save_pretrained(d, safe_serialization=True)


def build_data(path, n=600):
    words = "fox dog cat sun moon tree rock fish bird star".split()
    examples = []
    for i in range(n):
        w = words[i % len(words)]
        examples.append({
            "instruction": f"Repeat the word {w} three times.",
            "output": f"{w} {w} {w}",
        })
    with open(path, "w") as f:
        json.dump(examples, f)


def main():
    from bench import enable_compilation_cache
    enable_compilation_cache()
    from sparse_matrix_tuning_tpu.cli.fine_tune import main as ft_main

    work = tempfile.mkdtemp(prefix="smoke_")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(ckpt)
    build_ckpt(ckpt)
    data = os.path.join(work, "train.json")
    build_data(data)
    out = os.path.join(work, "out")

    history = ft_main([
        "--model_name_or_path", ckpt,
        "--data_path", data,
        "--output_dir", out,
        "--matrix_sparsity", "--full_ft_steps", "5",
        "--downsample_attention_blocks_ratio", "0.0084",
        "--downsample_mlp_blocks_ratio", "0.0084",
        "--per_device_ft_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--num_ft_epochs", "1",
        "--max_seq_len", "256",
        "--eval_step", "20",
        "--ft_learning_rate", "5e-4", "--smt_lr", "5e-4",
        "--seed", "7",
    ])
    losses = history["train_loss"]
    print(f"SMOKE: steps={len(losses)} first_losses={losses[:3]} "
          f"last_losses={losses[-3:]}")
    assert losses[-1] < losses[0], "loss did not decrease"
    assert os.path.exists(os.path.join(out, "final", "model.safetensors"))
    assert os.path.exists(os.path.join(out, "final", "smt_plan.json"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    print("SMOKE OK:", work)


if __name__ == "__main__":
    main()
