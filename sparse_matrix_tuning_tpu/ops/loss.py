"""Cross-entropy over a chunked vocabulary — fuses the LM head matmul with
the loss so the full (B, S, V) fp32 logits tensor is never materialised.

At Llama vocab sizes the logits buffer dominates loss-path HBM traffic
(bs8 x seq1024 x 32k fp32 = 1 GB written + re-read in fwd, recomputed in
bwd). Here an online log-sum-exp scans over vocab chunks; each chunk's
logits live only in registers/VMEM-scale working set, and jax.checkpoint
on the chunk body keeps backward memory flat (grad_hidden accumulates
(softmax_chunk - onehot_chunk) @ head_chunk per chunk).

Numerically identical (fp32) to the plain shifted CE in models/llama.py —
see tests/test_loss.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


@partial(jax.jit, static_argnums=(3,))
def chunked_causal_lm_loss(hidden: jax.Array, head: jax.Array,
                           labels: jax.Array, vocab_chunk: int = 4096):
    """hidden: (B, S, D) final decoder states (pre-head); head: (V, D);
    labels: (B, S) with -100 ignore. Shifted CE, mean over valid tokens."""
    b, s, d = hidden.shape
    v = head.shape[0]
    h = hidden[:, :-1, :].reshape(-1, d)           # (T, D)
    t = labels[:, 1:].reshape(-1)                  # (T,)
    valid = t != IGNORE_INDEX
    tsafe = jnp.where(valid, t, 0)

    pad_v = (-v) % vocab_chunk
    n_chunks = (v + pad_v) // vocab_chunk

    if pad_v:
        head = jnp.pad(head, ((0, pad_v), (0, 0)))
    head_chunks = head.reshape(n_chunks, vocab_chunk, d)

    tt = h.shape[0]
    init = (jnp.full((tt,), -jnp.inf, jnp.float32),   # running max
            jnp.zeros((tt,), jnp.float32),             # running sum exp
            jnp.zeros((tt,), jnp.float32))             # target logit

    @jax.checkpoint
    def body(carry, inp):
        ci, hc = inp
        m, se, tgt = carry
        logits = jax.lax.dot_general(
            h, hc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (T, C)
        if pad_v:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col + ci * vocab_chunk < v, logits, -jnp.inf)
        cmax = jnp.max(logits, axis=-1)
        new_m = jnp.maximum(m, cmax)
        se = se * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=-1)
        # target logit if it falls in this chunk
        local = tsafe - ci * vocab_chunk
        in_chunk = (local >= 0) & (local < vocab_chunk)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, vocab_chunk - 1)[:, None], axis=1)[:, 0]
        tgt = jnp.where(in_chunk, picked, tgt)
        return (new_m, se, tgt), None

    (m, se, tgt), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), head_chunks))

    lse = m + jnp.log(se)
    tok_loss = jnp.where(valid, lse - tgt, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return tok_loss.sum() / denom
