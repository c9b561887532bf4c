"""TPU soak: ~250-step SMT run on the real chip with mixed sequence
lengths (bucket switching), eval/save cadences, then an orbax resume that
continues training. Run: python tools/soak_tpu.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from smoke_tpu import build_ckpt  # noqa: E402


def build_data(path, n=2000):
    import numpy as np
    rng = np.random.default_rng(0)
    words = "fox dog cat sun moon tree rock fish bird star".split()
    examples = []
    for i in range(n):
        w = words[i % len(words)]
        reps = int(rng.integers(1, 40))  # varied lengths -> bucket switching
        examples.append({
            "instruction": f"Repeat the word {w} exactly {reps} times.",
            "output": " ".join([w] * reps),
        })
    with open(path, "w") as f:
        json.dump(examples, f)


def main():
    from bench import enable_compilation_cache
    enable_compilation_cache()
    from sparse_matrix_tuning_tpu.cli.fine_tune import main as ft_main
    from sparse_matrix_tuning_tpu.train.checkpoint import restore_checkpoint

    work = tempfile.mkdtemp(prefix="soak_")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(ckpt)
    build_ckpt(ckpt)
    data = os.path.join(work, "train.json")
    build_data(data)
    out = os.path.join(work, "out")

    args = [
        "--model_name_or_path", ckpt, "--data_path", data,
        "--output_dir", out,
        "--matrix_sparsity", "--full_ft_steps", "20",
        "--downsample_attention_blocks_ratio", "0.0084",
        "--downsample_mlp_blocks_ratio", "0.0084",
        "--per_device_ft_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--num_ft_epochs", "1", "--max_seq_len", "256",
        "--eval_step", "50", "--ft_learning_rate", "5e-4",
        "--smt_lr", "5e-4", "--seed", "11",
    ]
    history = ft_main(args)
    losses = history["train_loss"]
    print(f"SOAK run1: steps={len(losses)} first={losses[0]:.3f} "
          f"last={losses[-1]:.3f} evals={len(history['eval_loss'])}")
    assert losses[-1] < losses[0]
    assert all(p > 0 for p in history["ppl"])
    assert os.path.isdir(os.path.join(out, "ckpt"))

    # resume: extend to 2 epochs from the epoch-1 checkpoint
    history2 = ft_main(args + ["--num_ft_epochs", "2",
                               "--resume_from", os.path.join(out, "ckpt")])
    losses2 = history2["train_loss"]
    print(f"SOAK run2(resumed): steps={len(losses2)} last={losses2[-1]:.3f}")
    assert losses2, "resume produced no steps"
    assert losses2[-1] < losses[0]

    # run 3: grad_sum saliency THROUGH THE SCAN WARM-UP (forced scan at
    # 8 layers) -> conversion -> scan sparse phase, on the real chip —
    # the exact path of the round-4 multi-host regression (VERDICT r4
    # next #8 asks the soak to cover it).
    out3 = os.path.join(work, "out_scan")
    args3 = [a for a in args]
    args3[args3.index(out)] = out3
    history3 = ft_main(args3 + ["--scan_layers", "on",
                                "--saliency_accumulation", "grad_sum"])
    losses3 = history3["train_loss"]
    print(f"SOAK run3(grad_sum scan warm-up): steps={len(losses3)} "
          f"first={losses3[0]:.3f} last={losses3[-1]:.3f}")
    assert losses3[-1] < losses3[0]
    print("SOAK OK:", work)


if __name__ == "__main__":
    main()
