from sparse_matrix_tuning_tpu.models.llama import (  # noqa: F401
    LlamaConfig,
    init_params,
    forward,
    causal_lm_loss,
    TARGET_MODULES,
    ATTN_TARGETS,
    MLP_TARGETS,
    target_module_dims,
)
