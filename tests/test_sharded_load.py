"""Shard-aware safetensors loading: every device reads only its slice;
result equals the host-materialised load."""
import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.models.hf_io import (
    load_hf_config, load_hf_params, load_hf_params_sharded,
)
from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh

from test_cli import tiny_hf_dir  # noqa: F401


def test_sharded_load_matches_full(tiny_hf_dir):  # noqa: F811
    cfg = load_hf_config(tiny_hf_dir)
    mesh = make_mesh((1, 4, 2))
    full = load_hf_params(tiny_hf_dir, cfg, dtype=jnp.float32)
    sharded = load_hf_params_sharded(tiny_hf_dir, mesh, cfg, dtype=jnp.float32)

    assert jax.tree.structure(full) == jax.tree.structure(sharded)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(sharded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights actually distributed: gate_proj is column-parallel
    w = sharded["layers"]["0"]["gate_proj"]  # (512, 256): tensor x fsdp
    shapes = {s.data.shape for s in w.addressable_shards}
    assert shapes == {(256, 64)}
