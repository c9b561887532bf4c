"""Cross-entropy over a chunked vocabulary — fuses the LM head matmul with
the loss so the full (B, S, V) fp32 logits tensor is never materialised.

At Llama vocab sizes the logits buffer dominates loss-path HBM traffic
(bs8 x seq1024 x 32k fp32 = 1 GB written + re-read in fwd, recomputed in
bwd). Here an online log-sum-exp scans over vocab chunks; each chunk's
logits live only in registers/VMEM-scale working set, and jax.checkpoint
on the chunk body keeps backward memory flat (grad_hidden accumulates
(softmax_chunk - onehot_chunk) @ head_chunk per chunk).

Two heads share one online-LSE core (`_chunked_lse_loss`):
  * chunked_causal_lm_loss    — exact bf16/fp32 head matmul
  * chunked_causal_lm_loss_q8 — int8 frozen head (head_quant): hidden is
    row-quantized ONCE, each chunk runs an int8 dot_general with a
    straight-through custom_vjp for grad_hidden

The exact form is numerically identical (fp32) to the plain shifted CE in
models/llama.py — see tests/test_loss.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _chunked_lse_loss(hidden, labels, v: int, vocab_chunk: int,
                      chunk_logits, chunk_arrays):
    """Shared online-LSE core. chunk_logits(h2, *per_chunk) -> (T, C) fp32
    logits for one vocab chunk; chunk_arrays: tuple of arrays with leading
    dim (n_chunks,) scanned alongside the chunk index (pre-padded to the
    chunk multiple by the caller). h2 is the flattened (T, D) hidden slice
    the caller provides (dtype chosen by the head impl)."""
    h2, labels = hidden, labels
    t = labels.reshape(-1)
    valid = t != IGNORE_INDEX
    tsafe = jnp.where(valid, t, 0)

    pad_v = (-v) % vocab_chunk
    n_chunks = (v + pad_v) // vocab_chunk

    tt = h2.shape[0]
    init = (jnp.full((tt,), -jnp.inf, jnp.float32),   # running max
            jnp.zeros((tt,), jnp.float32),             # running sum exp
            jnp.zeros((tt,), jnp.float32))             # target logit

    @jax.checkpoint
    def body(carry, inp):
        ci, per_chunk = inp
        m, se, tgt = carry
        logits = chunk_logits(h2, *per_chunk)          # (T, C) fp32
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
        body, init, (jnp.arange(n_chunks), chunk_arrays))

    lse = m + jnp.log(se)
    tok_loss = jnp.where(valid, lse - tgt, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return tok_loss.sum() / denom


@partial(jax.jit, static_argnums=(3,))
def chunked_causal_lm_loss(hidden: jax.Array, head: jax.Array,
                           labels: jax.Array, vocab_chunk: int = 4096):
    """hidden: (B, S, D) final decoder states (pre-head); head: (V, D);
    labels: (B, S) with -100 ignore. Shifted CE, mean over valid tokens."""
    b, s, d = hidden.shape
    v = head.shape[0]
    h = hidden[:, :-1, :].reshape(-1, d)               # (T, D)

    pad_v = (-v) % vocab_chunk
    if pad_v:
        head = jnp.pad(head, ((0, pad_v), (0, 0)))
    head_chunks = head.reshape(-1, vocab_chunk, d)

    def chunk_logits(h2, hc):
        return jax.lax.dot_general(
            h2, hc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (T, C)

    return _chunked_lse_loss(h, labels[:, 1:], v, vocab_chunk,
                             chunk_logits, (head_chunks,))


# ---------------------------------------------------------------------------
# Int8-head variant (head_quant, train/convert.py resolve_head_quant)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _q8_chunk_logits(h, xq, sx, wqc, swc):
    """fp32 chunk logits (T, C) = (xq @ wqc.T) * sx * swc on the MXU int8
    path. h (T, D) fp32 rides along ONLY to carry the gradient: the fwd
    never reads it (XLA DCEs it), and the bwd is the straight-through int8
    grad_input of ops/sparse_linear.frozen_q8_linear — autodiff through
    round/clip would yield zero grad_hidden."""
    y = jax.lax.dot_general(xq, wqc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * swc


def _q8_chunk_logits_fwd(h, xq, sx, wqc, swc):
    return _q8_chunk_logits(h, xq, sx, wqc, swc), (xq, sx, wqc, swc)


def _q8_chunk_logits_bwd(res, g):
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul
    from sparse_matrix_tuning_tpu.ops.sparse_linear import _zero_cotangent
    xq, sx, wqc, swc = res
    grad_h = q8_matmul(g, wqc, swc)
    return (grad_h, _zero_cotangent(xq), jnp.zeros_like(sx),
            _zero_cotangent(wqc), jnp.zeros_like(swc))


_q8_chunk_logits.defvjp(_q8_chunk_logits_fwd, _q8_chunk_logits_bwd)


@partial(jax.jit, static_argnums=(4,))
def chunked_causal_lm_loss_q8(hidden: jax.Array, head_wq: jax.Array,
                              head_sw: jax.Array, labels: jax.Array,
                              vocab_chunk: int = 4096):
    """chunked_causal_lm_loss over an int8 frozen head (head_wq (V, D)
    int8, head_sw (V,) fp32, train/convert.py build_q_head). The hidden
    states are row-quantized ONCE (not per chunk); each chunk's matmul is
    an int8 dot_general and the LSE stays fp32. Logit values are bitwise
    what the dense-path frozen_q8_linear head produces, so the chunked and
    dense q8 losses agree to fp32 reduction order."""
    from sparse_matrix_tuning_tpu.ops.quant import row_quant

    b, s, d = hidden.shape
    v = head_wq.shape[0]
    h = hidden[:, :-1, :].reshape(-1, d).astype(jnp.float32)   # (T, D)
    xq, sx = row_quant(jax.lax.stop_gradient(h))

    pad_v = (-v) % vocab_chunk
    if pad_v:
        head_wq = jnp.pad(head_wq, ((0, pad_v), (0, 0)))
        head_sw = jnp.pad(head_sw, (0, pad_v))
    wq_chunks = head_wq.reshape(-1, vocab_chunk, d)
    sw_chunks = head_sw.reshape(-1, vocab_chunk)

    def chunk_logits(h2, wqc, swc):
        return _q8_chunk_logits(h2, xq, sx, wqc, swc)

    return _chunked_lse_loss(h, labels[:, 1:], v, vocab_chunk,
                             chunk_logits, (wq_chunks, sw_chunks))
