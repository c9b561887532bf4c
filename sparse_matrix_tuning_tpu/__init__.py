"""sparse_matrix_tuning_tpu — TPU-native Sparse Matrix Tuning (SMT).

A brand-new JAX / XLA / Pallas / pjit fine-tuning framework with the
capabilities of the SMT reference implementation
(yudaohai666/Sparse_Matrix_Tuning, ICLR 2025 "SMT: Fine-Tuning Large
Language Models with Sparse Matrices", arXiv:2405.15525).

After a short full-fine-tuning warm-up, a gradient- (or activation-)
based saliency scan selects the most significant 256x256 weight
sub-matrices (or input channels) of the attention and MLP linears.
Training then continues with only those ~0.7-0.9% of parameters
trainable: gradients, optimizer state and update compute exist only for
the selected blocks, while the frozen dense weights stay bf16 and (on a
multi-chip mesh) FSDP-sharded over ICI.

Design notes vs. the reference (see SURVEY.md for file:line citations):
  * the reference scatters trainable blocks into the dense weight on
    EVERY forward (reference deepspeed/smt/smt.py:331-341); here the
    scatter happens once per optimizer step into a donated buffer, and
    the forward is a single dense MXU matmul.
  * the reference pulls full ZeRO-departitioned grads to host fp32 each
    warm-up step (reference deepspeed/fine_tune.py:716-768); here the
    saliency accumulators live in the (sharded) train state and are
    updated inside the jitted warm-up step.
  * selection, freezing and conversion are pure functions over pytrees
    instead of in-place nn.Module surgery.
"""

__version__ = "0.1.0"

BLOCK = 256  # SMT block dimension (reference deepspeed/smt/smt.py:22)

from sparse_matrix_tuning_tpu.config import SMTConfig  # noqa: E402,F401


def __getattr__(name):
    """Lazy public API (keeps `import sparse_matrix_tuning_tpu` light)."""
    lazy = {
        "SMTTrainer": ("sparse_matrix_tuning_tpu.train.trainer", "SMTTrainer"),
        "SMTPlan": ("sparse_matrix_tuning_tpu.smt.plan", "SMTPlan"),
        "LlamaConfig": ("sparse_matrix_tuning_tpu.models.llama", "LlamaConfig"),
        "load_hf_params": ("sparse_matrix_tuning_tpu.models.hf_io", "load_hf_params"),
        "load_hf_config": ("sparse_matrix_tuning_tpu.models.hf_io", "load_hf_config"),
        "load_hf_tokenizer": ("sparse_matrix_tuning_tpu.models.hf_io", "load_hf_tokenizer"),
        "save_hf_format": ("sparse_matrix_tuning_tpu.models.hf_io", "save_hf_format"),
        "generate": ("sparse_matrix_tuning_tpu.eval.generate", "generate"),
        "GenerationConfig": ("sparse_matrix_tuning_tpu.eval.generate", "GenerationConfig"),
        "make_mesh": ("sparse_matrix_tuning_tpu.parallel.mesh", "make_mesh"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
