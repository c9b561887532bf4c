from sparse_matrix_tuning_tpu.smt.select import (  # noqa: F401
    block_stats,
    channel_stats,
    select_channels,
    select_submatrices,
)
from sparse_matrix_tuning_tpu.smt.plan import SMTPlan, LinearPlan  # noqa: F401
