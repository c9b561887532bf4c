"""Logging / seeding utilities (reference deepspeed_helpers.py:166-174,
:369-381)."""

from __future__ import annotations

import random

import numpy as np


def print_rank_0(msg, rank: int | None = None):
    """Print once per job (reference print_rank_0). Under JAX multi-host,
    process 0 is 'rank 0'."""
    import jax
    if rank is None:
        rank = jax.process_index()
    if rank <= 0:
        print(msg, flush=True)


def set_random_seed(seed: int):
    """Seed python/numpy (+torch when present, for the HF tokenizer paths);
    JAX randomness is explicit via PRNG keys derived from this seed."""
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
