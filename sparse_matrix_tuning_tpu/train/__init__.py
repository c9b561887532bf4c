from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer  # noqa: F401
