from sparse_matrix_tuning_tpu.utils.logging import print_rank_0, set_random_seed  # noqa: F401
from sparse_matrix_tuning_tpu.utils.throughput import (  # noqa: F401
    calculate_flops, hbm_stats, ThroughputReporter,
)
