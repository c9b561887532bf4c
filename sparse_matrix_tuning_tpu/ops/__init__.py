from sparse_matrix_tuning_tpu.ops.sparse_linear import (  # noqa: F401
    smt_linear,
    smt_channel_linear,
    make_sparse_linear_dispatch,
)
