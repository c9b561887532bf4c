"""Int4 (nibble-packed) frozen base — quantization utils, fused Pallas
matmul kernel (interpret mode on CPU), and the int4 DECODE path
(decode_params_from_scan frozen_quant="int4"). Invariants:

  * split-half packing layout: packed col k = original cols (k, k + I/2);
  * per-group round-trip error bounded by s4/2;
  * Pallas kernel == XLA reference up to fp32 accumulation order (both
    compute integer-exact group dots with fp32 group scales — the fp32
    dequant semantics the delta corrections are gathered against);
  * int4 prefill logits == a dense ORACLE built by scattering the trained
    blocks/columns into the dequantized int4 base (the selected weights are
    EXACT — only the frozen remainder carries int4 noise);
  * consume=True frees the int8 base during conversion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches

from sparse_matrix_tuning_tpu.ops.quant import (
    INT4_GROUP, dequantize_weight_int4, q4_matmul_t, q4_matmul_t_ref,
    quantize_weight_int4, unpack_int4,
)


def _rand_w(o, i, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((o, i)).astype(np.float32))


# ---------------------------------------------------------------------------
# quantization utils
# ---------------------------------------------------------------------------

def test_pack_layout_split_half():
    w = _rand_w(8, 512)
    w4, s4 = quantize_weight_int4(w)
    assert w4.shape == (8, 256) and w4.dtype == jnp.int8
    assert s4.shape == (8, 512 // INT4_GROUP)
    q = np.asarray(unpack_int4(w4))
    # re-derive the int values directly from w and the scales
    wf = np.asarray(w).reshape(8, -1, INT4_GROUP)
    expect = np.clip(np.round(wf / np.asarray(s4)[..., None]), -7, 7)
    expect = expect.reshape(8, 512).astype(np.int8)
    np.testing.assert_array_equal(q, expect)
    # packed byte k = (hi<<4)|lo with lo = col k, hi = col k + 256
    p = np.asarray(w4).view(np.uint8)
    np.testing.assert_array_equal(((p & 0xF) ^ 8).astype(np.int32) - 8,
                                  expect[:, :256])
    np.testing.assert_array_equal((((p >> 4) & 0xF) ^ 8).astype(np.int32) - 8,
                                  expect[:, 256:])


def test_roundtrip_error_bound():
    w = _rand_w(16, 512, seed=1)
    w4, s4 = quantize_weight_int4(w)
    wd = dequantize_weight_int4(w4, s4, jnp.float32)
    err = np.abs(np.asarray(wd - w)).reshape(16, -1, INT4_GROUP)
    bound = np.asarray(s4)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()


def test_small_dim_group_fallback():
    """I=128 < 2*INT4_GROUP falls back to group 64 (XLA-ref-only shapes)."""
    w = _rand_w(8, 128, seed=2)
    w4, s4 = quantize_weight_int4(w)
    assert s4.shape == (8, 2)
    wd = dequantize_weight_int4(w4, s4, jnp.float32)
    assert float(jnp.max(jnp.abs(wd - w))) <= float(jnp.max(s4)) * 0.5 + 1e-6


def test_bad_in_dim_raises():
    with pytest.raises(ValueError, match="multiple"):
        quantize_weight_int4(_rand_w(8, 120), group=64)


def test_ref_matmul_matches_dense():
    w = _rand_w(64, 512, seed=3)
    w4, s4 = quantize_weight_int4(w)
    x = _rand_w(8, 512, seed=4).astype(jnp.bfloat16)
    # fp64 oracle of the fp32-dequant semantics
    wd = np.asarray(dequantize_weight_int4(w4, s4, jnp.float32), np.float64)
    want = np.asarray(x, np.float64) @ wd.T
    got = q4_matmul_t_ref(x, w4, s4)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-2, atol=1e-2)  # bf16 output rounding


# ---------------------------------------------------------------------------
# Pallas kernel (interpret mode off-TPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t,o,i", [(8, 64, 512), (5, 128, 256), (32, 72, 768)])
def test_pallas_kernel_matches_ref(t, o, i):
    from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import q4_matmul_t_pallas
    w4, s4 = quantize_weight_int4(_rand_w(o, i, seed=5))
    x = _rand_w(t, i, seed=6).astype(jnp.bfloat16)
    got = q4_matmul_t_pallas(x, w4, s4)
    want = q4_matmul_t_ref(x, w4, s4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pallas_kernel_3d_batch():
    from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import q4_matmul_t_pallas
    w4, s4 = quantize_weight_int4(_rand_w(64, 512, seed=7))
    x = jnp.asarray(np.random.default_rng(8).standard_normal((3, 5, 512)),
                    jnp.bfloat16)
    got = q4_matmul_t_pallas(x, w4, s4)
    want = q4_matmul_t_ref(x, w4, s4)
    assert got.shape == (3, 5, 64)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_stacked_kernel_matches_per_layer_ref():
    """q4_matmul_t_stacked (scalar-prefetch layer indexing, K-tile-padded
    stack) == per-layer reference at every layer index."""
    from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import (
        build_scale_strips, pad_packed, q4_matmul_t_stacked_pallas)
    L, o, i = 3, 128, 512
    w4s, s4s = [], []
    for l in range(L):
        w4, s4 = quantize_weight_int4(_rand_w(o, i, seed=20 + l))
        w4s.append(w4)
        s4s.append(s4)
    w4p = pad_packed(jnp.stack(w4s))
    strips = [build_scale_strips(s4, i // 2) for s4 in s4s]
    slt = jnp.stack([s[0] for s in strips])
    sht = jnp.stack([s[1] for s in strips])
    x = _rand_w(8, i, seed=30).astype(jnp.bfloat16)
    for l in range(L):
        got = q4_matmul_t_stacked_pallas(x, w4p, slt, sht,
                                         jnp.int32(l))
        want = q4_matmul_t_ref(x, w4s[l], s4s[l])
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"layer {l}")


def test_dispatch_uses_ref_off_tpu():
    """q4_matmul_t must not invoke the (interpret-mode, slow) kernel on CPU."""
    w4, s4 = quantize_weight_int4(_rand_w(64, 512, seed=9))
    x = _rand_w(4, 512, seed=10).astype(jnp.bfloat16)
    got = q4_matmul_t(x, w4, s4)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(q4_matmul_t_ref(x, w4, s4),
                                             np.float32))


def test_frozen_q4_linear_grad():
    from sparse_matrix_tuning_tpu.ops.sparse_linear import frozen_q4_linear
    w = _rand_w(64, 512, seed=11)
    w4, s4 = quantize_weight_int4(w)
    wd = dequantize_weight_int4(w4, s4, jnp.float32)
    x = _rand_w(4, 512, seed=12)
    y, vjp = jax.vjp(lambda xx: frozen_q4_linear(xx, w4, s4), x)
    want_y = jnp.einsum("ti,oi->to", x.astype(jnp.float32), wd)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want_y, np.float32),
                               rtol=1e-5, atol=1e-5)
    g = _rand_w(4, 64, seed=13)
    (gx,) = vjp(g)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(g @ wd))


# ---------------------------------------------------------------------------
# int4 decode path
# ---------------------------------------------------------------------------

def _dense_oracle_params(t, p4, mode="matrix"):
    """Stacked DENSE decode params where each frozen weight is the
    dequantized int4 base and the trained blocks/columns are scattered in —
    an independent path (plain dense decode) that must match the corrected
    int4 forward exactly (modulo matmul precision)."""
    from sparse_matrix_tuning_tpu.smt.plan import BLOCK
    q4 = p4["layers_q8"]["q"]
    idx = p4["layers_q8"]["idx"]
    stacked = {}
    for mod, w in t.state["params"]["layers_stacked"].items():
        if mod in q4:
            wd = np.stack([
                np.asarray(dequantize_weight_int4(q4[mod]["w4"][l],
                                                  q4[mod]["s4"][l],
                                                  jnp.float32))
                for l in range(w.shape[0])])
        else:
            wd = np.asarray(w, np.float32)
        if mod in idx:
            tr = np.asarray(t.state["trainable"][mod], np.float32)
            valid = np.asarray(idx[mod]["valid"])
            if mode == "channel":
                ci = np.asarray(idx[mod]["ci"])
                for l in range(wd.shape[0]):
                    for j in range(valid.shape[1]):
                        if valid[l, j]:
                            wd[l][:, ci[l, j]] = tr[l, :, j]
            else:
                rb, cb = np.asarray(idx[mod]["rb"]), np.asarray(idx[mod]["cb"])
                for l in range(wd.shape[0]):
                    wb = wd[l].reshape(wd.shape[1] // BLOCK, BLOCK,
                                       wd.shape[2] // BLOCK, BLOCK)
                    for j in range(valid.shape[1]):
                        if valid[l, j]:
                            wb[rb[l, j], :, cb[l, j], :] = tr[l, j]
        stacked[mod] = jnp.asarray(wd, jnp.float32)
    p = {k: jnp.asarray(v, jnp.float32) for k, v in p4.items()
         if k not in ("layers_q8", "layers_stacked")}
    p["layers_stacked"] = stacked
    return p


def _prefill_logits(p, ids, mask):
    from sparse_matrix_tuning_tpu.models.llama import (
        forward_with_cache, init_cache)
    b, s = ids.shape
    cache = init_cache(CFG, b, s, dtype=jnp.float32, stacked=True)
    positions = jnp.maximum(jnp.cumsum(jnp.asarray(mask), axis=-1) - 1, 0)
    logits, _ = forward_with_cache(p, jnp.asarray(ids), CFG, cache, 0,
                                   jnp.asarray(mask, jnp.int32), positions)
    return logits


@pytest.fixture(scope="module")
def q8_trainer():
    from test_scan_phase import _train
    t, losses = _train("on", fq="int8", n=4)
    assert "q" in t.state and np.isfinite(losses).all()
    return t


def test_int4_decode_matches_dense_oracle(q8_trainer):
    from sparse_matrix_tuning_tpu.eval.generate import decode_params_from_scan
    t = q8_trainer
    p4 = decode_params_from_scan(t.state, CFG, host_frozen=t._host_frozen,
                                 frozen_quant="int4")
    batch = make_batches(1, bsz=2, seq=16)[0]
    got = _prefill_logits(p4, batch["input_ids"], batch["attention_mask"])
    oracle = _dense_oracle_params(t, p4)
    want = _prefill_logits(oracle, batch["input_ids"],
                           batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_int4_base_regathered_from_int4(q8_trainer):
    """base4 must be gathered from the DEQUANTIZED INT4 base (not the int8
    one) — that is what keeps the selected blocks exact."""
    from sparse_matrix_tuning_tpu.smt.plan import BLOCK
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        requantize_scan_base_int4)
    t = q8_trainer
    q4, base4 = requantize_scan_base_int4(t.state)
    for mod, meta in t.state["idx"].items():
        rb = np.asarray(meta["rb"])
        cb = np.asarray(meta["cb"])
        wd0 = np.asarray(dequantize_weight_int4(q4[mod]["w4"][0],
                                                q4[mod]["s4"][0],
                                                jnp.float32))
        wb = wd0.reshape(wd0.shape[0] // BLOCK, BLOCK,
                         wd0.shape[1] // BLOCK, BLOCK)
        np.testing.assert_array_equal(
            np.asarray(base4[mod][0, 0]), wb[rb[0, 0], :, cb[0, 0], :])
        # and it differs from the int8 base somewhere (int4 is coarser)
        assert not np.array_equal(np.asarray(base4[mod]),
                                  np.asarray(t.state["base"][mod]))


def test_int4_generate_runs(q8_trainer):
    from sparse_matrix_tuning_tpu.eval.generate import (
        GenerationConfig, decode_params_from_scan, generate)
    t = q8_trainer
    p4 = decode_params_from_scan(t.state, CFG, host_frozen=t._host_frozen,
                                 frozen_quant="int4")
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, CFG.vocab_size, (2, 8)).astype(np.int32)
    gen = GenerationConfig(max_new_tokens=4, num_beams=2, eos_token_id=2,
                           pad_token_id=0, cache_dtype="float32")
    out = generate(p4, CFG, prompt, np.ones_like(prompt), gen)
    assert out.shape == (2, 4) and np.isfinite(out.astype(np.float64)).all()


def test_consume_frees_int8(q8_trainer):
    import copy
    from sparse_matrix_tuning_tpu.eval.generate import decode_params_from_scan
    t = q8_trainer
    state = dict(t.state)
    state["q"] = copy.copy(t.state["q"])  # shallow per-module dict
    p4 = decode_params_from_scan(state, CFG, host_frozen=t._host_frozen,
                                 frozen_quant="int4", consume=True)
    assert state["q"] == {}
    assert all("w4" in m for m in p4["layers_q8"]["q"].values())


def test_bad_frozen_quant_raises(q8_trainer):
    from sparse_matrix_tuning_tpu.eval.generate import decode_params_from_scan
    with pytest.raises(ValueError, match="int4"):
        decode_params_from_scan(q8_trainer.state, CFG,
                                host_frozen=q8_trainer._host_frozen,
                                frozen_quant="fp8")


def test_int4_channel_mode_matches_oracle():
    from test_scan_channel import _train as _train_channel
    from sparse_matrix_tuning_tpu.eval.generate import decode_params_from_scan
    t, losses = _train_channel("on", fq="int8", n=4)
    assert "q" in t.state and np.isfinite(losses).all()
    p4 = decode_params_from_scan(t.state, CFG, host_frozen=t._host_frozen,
                                 frozen_quant="int4")
    batch = make_batches(1, bsz=2, seq=16)[0]
    got = _prefill_logits(p4, batch["input_ids"], batch["attention_mask"])
    oracle = _dense_oracle_params(t, p4, mode="channel")
    want = _prefill_logits(oracle, batch["input_ids"],
                           batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_int4_generate_int8_kv_cache(q8_trainer):
    """int4 frozen base x int8 quantized KV cache — the two decode
    bandwidth levers compose in the same scan body."""
    from sparse_matrix_tuning_tpu.eval.generate import (
        GenerationConfig, decode_params_from_scan, generate)
    t = q8_trainer
    p4 = decode_params_from_scan(t.state, CFG, host_frozen=t._host_frozen,
                                 frozen_quant="int4")
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, CFG.vocab_size, (2, 8)).astype(np.int32)
    gen = GenerationConfig(max_new_tokens=4, num_beams=1, eos_token_id=2,
                           pad_token_id=0, cache_dtype="int8")
    out = generate(p4, CFG, prompt, np.ones_like(prompt), gen)
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()


def test_q4_prefill_rows_route_to_mxu():
    """Above Q4_DECODE_MAX_ROWS the dispatch dequantizes and uses a dense
    einsum (MXU at prefill shapes) — numerics stay within bf16 tolerance
    of the fp32 oracle, for both the flat and stacked forms."""
    from sparse_matrix_tuning_tpu.ops.pallas.q4_matmul import (
        build_scale_strips, pad_packed)
    from sparse_matrix_tuning_tpu.ops.quant import (
        Q4_DECODE_MAX_ROWS, q4_matmul_t, q4_matmul_t_stacked)
    o, i = 128, 512
    w4, s4 = quantize_weight_int4(_rand_w(o, i, seed=40))
    t = Q4_DECODE_MAX_ROWS + 8
    x = _rand_w(t, i, seed=41).astype(jnp.bfloat16)
    want = q4_matmul_t_ref(x, w4, s4)
    got = q4_matmul_t(x, w4, s4)
    # bf16 dequant + bf16 accumulation noise scales with the output
    # magnitude; the routing (not exactness) is what's under test
    tol = 0.02 * float(np.abs(np.asarray(want, np.float32)).max()) + 1e-3
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol)
    w4p = pad_packed(w4[None])
    slt, sht = build_scale_strips(s4, i // 2)
    got_s = q4_matmul_t_stacked(x, w4p, slt[None], sht[None],
                                jnp.int32(0), s4s=s4[None])
    np.testing.assert_allclose(np.asarray(got_s, np.float32),
                               np.asarray(want, np.float32), atol=tol)
