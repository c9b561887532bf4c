"""Persistent XLA compilation cache (SURVEY §5.1 practicality).

First compiles over the axon tunnel are 20-40s per program (minutes at 8B
depth); the persistent cache makes every repeat run — CLI restarts, resume,
the 8-dataset eval harness — reuse compiled executables across processes.
Override the location with SMT_JAX_CACHE.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SMT_JAX_CACHE", "/tmp/smt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
