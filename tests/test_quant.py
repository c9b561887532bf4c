"""Int8 frozen-base sparse linear: quantization bounds, exact block
corrections, gradient parity with the bf16 oracle, and e2e training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.ops.quant import (
    dequantize_weight, q8_matmul, q8_matmul_t, quantize_weight, row_quant,
)
from sparse_matrix_tuning_tpu.ops.sparse_linear import (
    frozen_q8_linear, make_sparse_linear_dispatch, smt_linear, smt_linear_q8,
)
from sparse_matrix_tuning_tpu.smt.plan import BLOCK, LinearPlan, SMTPlan

from test_train_e2e import CFG, make_batches, smt_cfg


def test_weight_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    wd = dequantize_weight(wq, sw, jnp.float32)
    # symmetric per-channel int8: |err| <= scale/2 per element
    err = np.abs(np.asarray(w) - np.asarray(wd))
    bound = np.asarray(sw)[:, None] * 0.5 + 1e-8
    assert (err <= bound).all()


def test_row_quant_reconstruction():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 64)) * 0.3, jnp.float32)
    xq, sx = row_quant(x)
    rec = np.asarray(xq, np.float32) * np.asarray(sx)
    assert np.abs(rec - np.asarray(x)).max() <= float(sx.max()) * 0.5 + 1e-7


def test_q8_matmul_t_matches_dequant_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 64)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 64)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    y = np.asarray(q8_matmul_t(x, wq, sw))
    # independent reference of the same quantized algorithm
    xq, sx = row_quant(x)
    ref = (np.asarray(xq, np.float64) @ np.asarray(wq, np.float64).T
           * np.asarray(sx) * np.asarray(sw)[None, :])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)
    # and it approximates the unquantized matmul
    exact = np.asarray(x, np.float64) @ np.asarray(w, np.float64).T
    scale = np.abs(exact).max()
    assert np.abs(y - exact).max() < 0.02 * scale + 1e-4


def test_q8_matmul_grad_orientation():
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((8, 32)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 64)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    got = np.asarray(q8_matmul(g, wq, sw))
    exact = np.asarray(g, np.float64) @ np.asarray(w, np.float64)
    assert np.abs(got - exact).max() < 0.02 * np.abs(exact).max() + 1e-4


def _mk_planned(rng, n_rb=2, n_cb=1):
    O, I = 2 * BLOCK, 1 * BLOCK
    lp = LinearPlan("q_proj", 0, O, I, blocks=((0, 0), (1, 0)))
    w = jnp.asarray(rng.standard_normal((O, I)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    rb, cb = lp.row_blocks(), lp.col_blocks()
    wq4 = wq.reshape(O // BLOCK, BLOCK, I // BLOCK, BLOCK)
    sw_rows = sw.reshape(O // BLOCK, BLOCK)[rb]
    base = wq4[jnp.asarray(rb), :, jnp.asarray(cb), :].astype(jnp.float32) \
        * sw_rows[:, :, None]
    w4 = w.reshape(O // BLOCK, BLOCK, I // BLOCK, BLOCK)
    blocks = w4[jnp.asarray(rb), :, jnp.asarray(cb), :].astype(jnp.float32)
    return lp, w, wq, sw, base, blocks


def test_q8_block_correction_is_exact():
    """Moving the trainable blocks must change the output EXACTLY like the
    dense path — the int8 noise lives only in the frozen base."""
    rng = np.random.default_rng(4)
    lp, w, wq, sw, base, blocks = _mk_planned(rng)
    x = jnp.asarray(rng.standard_normal((8, lp.in_dim)) * 0.1, jnp.float32)

    db = jnp.asarray(rng.standard_normal(blocks.shape) * 0.01, jnp.float32)
    y1 = smt_linear_q8(x, blocks, wq, sw, base, lp, impl="oracle")
    y2 = smt_linear_q8(x, blocks + db, wq, sw, base, lp, impl="oracle")
    diff = np.asarray(y2 - y1)

    # dense-formula diff: x[:, cb] @ db.T scattered to rows rb
    want = np.zeros_like(diff)
    for j, (rb, cb) in enumerate(lp.blocks):
        xc = np.asarray(x)[:, cb * BLOCK:(cb + 1) * BLOCK]
        want[:, rb * BLOCK:(rb + 1) * BLOCK] += xc @ np.asarray(db[j]).T
    np.testing.assert_allclose(diff, want, rtol=1e-4, atol=1e-5)


def test_q8_forward_approximates_bf16_path():
    rng = np.random.default_rng(5)
    lp, w, wq, sw, base, blocks = _mk_planned(rng)
    x = jnp.asarray(rng.standard_normal((8, lp.in_dim)) * 0.1, jnp.float32)
    y_q8 = np.asarray(smt_linear_q8(x, blocks, wq, sw, base, lp, impl="oracle"))
    y_bf = np.asarray(smt_linear(x, blocks, w, lp, impl="oracle"))
    assert np.abs(y_q8 - y_bf).max() < 0.02 * np.abs(y_bf).max() + 1e-4


def test_q8_grad_blocks_bitwise_matches_oracle():
    """grad w.r.t. the trainable blocks is the same exact bf16 formula in
    both paths: identical for an identical cotangent."""
    rng = np.random.default_rng(6)
    lp, w, wq, sw, base, blocks = _mk_planned(rng)
    x = jnp.asarray(rng.standard_normal((8, lp.in_dim)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((8, lp.out_dim)) * 0.1, jnp.float32)

    _, vjp_q8 = jax.vjp(
        lambda b: smt_linear_q8(x, b, wq, sw, base, lp, impl="oracle"), blocks)
    _, vjp_bf = jax.vjp(
        lambda b: smt_linear(x, b, w, lp, impl="oracle"), blocks)
    gb_q8 = np.asarray(vjp_q8(g)[0])
    gb_bf = np.asarray(vjp_bf(g)[0])
    np.testing.assert_array_equal(gb_q8, gb_bf)


def test_q8_grad_x_approximates_dense():
    rng = np.random.default_rng(7)
    lp, w, wq, sw, base, blocks = _mk_planned(rng)
    x = jnp.asarray(rng.standard_normal((8, lp.in_dim)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((8, lp.out_dim)) * 0.1, jnp.float32)
    _, vjp_q8 = jax.vjp(
        lambda xx: smt_linear_q8(xx, blocks, wq, sw, base, lp, impl="oracle"), x)
    gx = np.asarray(vjp_q8(g)[0])
    exact = np.asarray(g, np.float64) @ np.asarray(w, np.float64)
    assert np.abs(gx - exact).max() < 0.03 * np.abs(exact).max() + 1e-4


def test_frozen_q8_linear_grad():
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    x = jnp.asarray(rng.standard_normal((4, 32)) * 0.1, jnp.float32)

    def f(xx):
        return jnp.sum(frozen_q8_linear(xx, wq, sw) ** 2)

    gx = np.asarray(jax.grad(f)(x))
    assert np.isfinite(gx).all() and np.abs(gx).max() > 0


def test_dispatch_routes_q8():
    rng = np.random.default_rng(9)
    lp, w, wq, sw, base, blocks = _mk_planned(rng)
    plan = SMTPlan(mode="matrix", linears={"0.q_proj": lp})
    qweights = {
        "0.q_proj": {"wq": wq, "sw": sw, "base": base},
        "0.o_proj": {"wq": wq, "sw": sw},  # frozen, unplanned
    }
    linear = make_sparse_linear_dispatch(plan, {"0.q_proj": blocks},
                                         impl="oracle", qweights=qweights)
    x = jnp.asarray(rng.standard_normal((4, lp.in_dim)) * 0.1, jnp.float32)
    y_planned = linear(x, w, "q_proj", 0)
    y_frozen = linear(x, w, "o_proj", 0)
    np.testing.assert_allclose(
        np.asarray(y_planned),
        np.asarray(smt_linear_q8(x, blocks, wq, sw, base, lp, impl="oracle")),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y_frozen),
                               np.asarray(frozen_q8_linear(x, wq, sw)),
                               rtol=1e-5, atol=1e-7)
    # unplanned, unquantized module falls back to dense
    y_dense = linear(x, w, "up_proj", 1)
    np.testing.assert_allclose(np.asarray(y_dense),
                               np.asarray(x @ w.T), rtol=1e-5, atol=1e-7)


def test_e2e_training_with_int8_frozen_base():
    """Tiny model, CPU, frozen_quant=int8: conversion builds the q tree,
    sparse training decreases loss, trajectory tracks the bf16 run."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    def run(fq):
        cfg = smt_cfg(frozen_quant=fq)
        params = init_params(jax.random.PRNGKey(0), CFG)
        trainer = SMTTrainer(cfg, CFG, params, total_steps=8)
        losses = [float(trainer.train_step(b)["loss"])
                  for b in make_batches(8)]
        return trainer, losses

    t_q8, l_q8 = run("int8")
    assert t_q8.phase == "sparse"
    assert "q" in t_q8.state
    assert t_q8.state["q"]["0.q_proj"]["wq"].dtype == jnp.int8
    assert "base" in t_q8.state["q"][next(iter(t_q8.plan.linears))]
    assert np.isfinite(l_q8).all()
    assert l_q8[-1] < l_q8[0]

    t_bf, l_bf = run("none")
    assert "q" not in t_bf.state
    # warm-up is identical; sparse losses close (int8 noise only)
    np.testing.assert_allclose(l_q8[:2], l_bf[:2], rtol=1e-6)
    np.testing.assert_allclose(l_q8[2:], l_bf[2:], rtol=0.05)


def test_frozen_quant_resolution():
    from sparse_matrix_tuning_tpu.train.convert import resolve_frozen_quant
    assert resolve_frozen_quant(smt_cfg(frozen_quant="int8"), "channel") == "none"
    assert resolve_frozen_quant(smt_cfg(frozen_quant="none"), "matrix") == "none"
    assert resolve_frozen_quant(smt_cfg(frozen_quant="int8"), "matrix") == "int8"
    # auto on CPU (tests force cpu) -> none
    assert resolve_frozen_quant(smt_cfg(frozen_quant="auto"), "matrix") == "none"


def test_q8_on_mesh():
    """int8 state shards + runs over the fake 8-device mesh."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    mesh = make_mesh((2, 2, 2))
    cfg = smt_cfg(frozen_quant="int8")
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=6, mesh=mesh)
    losses = [float(trainer.train_step(b)["loss"])
              for b in make_batches(6, bsz=8)]
    assert trainer.phase == "sparse" and "q" in trainer.state
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_q8_checkpoint_resume():
    """Mid-sparse-phase resume restores the q tree bit-identically."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer
    import tempfile

    cfg = smt_cfg(frozen_quant="int8")
    params = init_params(jax.random.PRNGKey(0), CFG)
    t1 = SMTTrainer(cfg, CFG, params, total_steps=8)
    batches = make_batches(8)
    for b in batches[:4]:
        t1.train_step(b)
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        t2 = SMTTrainer(smt_cfg(frozen_quant="int8"), CFG,
                        init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
        restore_checkpoint(d, t2)
    assert t2.phase == "sparse" and "q" in t2.state
    l1 = [float(t1.train_step(b)["loss"]) for b in batches[4:]]
    l2 = [float(t2.train_step(b)["loss"]) for b in batches[4:]]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_q8_correction_impls_agree(monkeypatch):
    """The three SMT_Q8_CORR strategies (grouped / dyn / batched — swept on
    the v5e, grouped fastest) must be numerically interchangeable: same
    forward, same grad_x, bitwise-same grad_blocks. Plan shares a row-block
    AND a col-block across entries to exercise the segment-sum paths."""
    rng = np.random.default_rng(11)
    O, I = 2 * BLOCK, 2 * BLOCK
    lp = LinearPlan("q_proj", 0, O, I, blocks=((0, 0), (1, 0), (0, 1)))
    from sparse_matrix_tuning_tpu.ops.quant import quantize_weight
    w = jnp.asarray(rng.standard_normal((O, I)) * 0.02, jnp.float32)
    wq, sw = quantize_weight(w)
    rb, cb = lp.row_blocks(), lp.col_blocks()
    wq4 = wq.reshape(O // BLOCK, BLOCK, I // BLOCK, BLOCK)
    base = wq4[jnp.asarray(rb), :, jnp.asarray(cb), :].astype(jnp.float32) \
        * sw.reshape(O // BLOCK, BLOCK)[rb][:, :, None]
    w4 = w.reshape(O // BLOCK, BLOCK, I // BLOCK, BLOCK)
    blocks = w4[jnp.asarray(rb), :, jnp.asarray(cb), :].astype(jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, I)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((8, O)) * 0.1, jnp.float32)

    outs = {}
    for impl in ("grouped", "dyn", "batched", "pallas"):
        monkeypatch.setenv("SMT_Q8_CORR", impl)
        y, vjp = jax.vjp(
            lambda xx, b: smt_linear_q8(xx, b, wq, sw, base, lp,
                                        impl="oracle"), x, blocks)
        gx, gb = vjp(g)
        outs[impl] = (np.asarray(y), np.asarray(gx), np.asarray(gb))
    ref = outs["grouped"]
    for impl in ("dyn", "batched", "pallas"):
        np.testing.assert_allclose(outs[impl][0], ref[0], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(outs[impl][1], ref[1], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_array_equal(outs[impl][2], ref[2])


def test_q8_mesh_matches_single_device():
    """int8 + q_head numerics agree between a clean (1,4,2) mesh and a
    single device (the (2,2,2) CPU-backend full-model miscompile is pinned
    elsewhere — see CLAUDE.md; this guards the q8/q_head stack on the
    shapes the suite certifies)."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    losses = {}
    for name, mesh in (("single", None), ("mesh", make_mesh((1, 4, 2)))):
        cfg = smt_cfg(frozen_quant="int8")
        params = init_params(jax.random.PRNGKey(0), CFG)
        t = SMTTrainer(cfg, CFG, params, total_steps=6, mesh=mesh)
        losses[name] = [float(t.train_step(b)["loss"])
                        for b in make_batches(6, bsz=8)]
        # both legs must actually run the int8 head (a policy miss here
        # would silently compare different objectives)
        assert "q_head" in t.state
    np.testing.assert_allclose(losses["mesh"], losses["single"], rtol=2e-3)
