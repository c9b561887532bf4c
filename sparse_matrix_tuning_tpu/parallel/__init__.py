from sparse_matrix_tuning_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_pspecs,
    batch_pspec,
    state_shardings,
)
