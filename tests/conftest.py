"""Test env: force CPU with 8 virtual devices BEFORE the backend initialises.

This gives the fake-cluster distributed testing the reference never had
(it requires real GPUs + NCCL even to import, reference smt/smt.py:20).

Note: this image pins JAX_PLATFORMS=axon (the TPU tunnel) in a way that
wins over the env var, so we override through jax.config before any
computation runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
