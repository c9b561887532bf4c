from sparse_matrix_tuning_tpu.eval.generate import GenerationConfig, generate  # noqa: F401
from sparse_matrix_tuning_tpu.eval.harness import (  # noqa: F401
    extract_answer, run_dataset_eval, COMMONSENSE_DATASETS, MATH_DATASETS,
)
