"""Scan-over-layers CHANNEL sparsity (VERDICT r2 next-step #2): the
dynamic-index channel linear (ops/sparse_linear.smt_channel_linear_dyn,
bf16 + int8 frozen bases), and the channel scan phase end-to-end — parity
with the unrolled channel phase, int8 exact-column correction, host
offload, export, checkpoint resume, mesh run.

Reference semantics: deepspeed/smt/smt.py:185-296 (linearChannel),
fine_tune.py:406-575 — which train channel sparsity at 8B; this layout is
what lets our channel path reach that scale (depth-independent compile +
int8 + offload).
"""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches, smt_cfg

from sparse_matrix_tuning_tpu.ops.quant import dequantize_weight, quantize_weight
from sparse_matrix_tuning_tpu.ops.sparse_linear import (
    smt_channel_linear, smt_channel_linear_dyn,
)
from sparse_matrix_tuning_tpu.smt.plan import LinearPlan


# ---------------------------------------------------------------------------
# op level
# ---------------------------------------------------------------------------

def _setup(seed=0, out_dim=192, in_dim=160, n=3):
    rng = np.random.default_rng(seed)
    w0 = jnp.asarray(rng.standard_normal((out_dim, in_dim)) * 0.05, jnp.float32)
    channels = (2, 7, 100)[:n]
    lp = LinearPlan("q_proj", 0, out_dim, in_dim, channels=channels)
    ci = jnp.asarray(channels, jnp.int32)
    base = jnp.take(w0, ci, axis=1)                       # (O, n)
    cols = base + jnp.asarray(
        rng.standard_normal(base.shape) * 0.01, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, in_dim)), jnp.float32)
    g_w = jnp.asarray(rng.standard_normal((8, out_dim)), jnp.float32)
    return lp, w0, base, cols, x, g_w, ci


def _scattered(w0, cols, lp):
    w = np.asarray(w0).copy()
    for j, c in enumerate(lp.channels):
        w[:, c] = np.asarray(cols)[:, j]
    return jnp.asarray(w)


def test_channel_dyn_bf16_matches_static():
    lp, w0, base, cols, x, g_w, ci = _setup()
    valid = jnp.ones((3,), bool)
    w_cur = _scattered(w0, cols, lp)   # static path: cols live in w

    def loss_dyn(cols):
        y = smt_channel_linear_dyn("oracle", x, cols, ci, valid,
                                   {"w": w0}, base)
        return jnp.sum(y * g_w), y

    def loss_static(cols):
        y = smt_channel_linear(x, cols, w_cur, lp, impl="oracle")
        return jnp.sum(y * g_w), y

    (_, y_d), g_d = jax.value_and_grad(loss_dyn, has_aux=True)(cols)
    (_, y_s), g_s = jax.value_and_grad(loss_static, has_aux=True)(cols)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_s),
                               rtol=1e-5, atol=1e-5)

    def lx_dyn(x):
        return jnp.sum(smt_channel_linear_dyn("oracle", x, cols, ci, valid,
                                              {"w": w0}, base) * g_w)

    def lx_static(x):
        return jnp.sum(smt_channel_linear(x, cols, w_cur, lp,
                                          impl="oracle") * g_w)

    np.testing.assert_allclose(np.asarray(jax.grad(lx_dyn)(x)),
                               np.asarray(jax.grad(lx_static)(x)),
                               rtol=1e-5, atol=1e-5)


def test_channel_dyn_q8_matches_composite():
    """The q8 channel forward must equal q8_base_matmul + exact column
    correction x_sel @ (cols - dequant_cols)^T — so the weight-space
    quantization error on the SELECTED columns cancels exactly (the column
    analogue of the q8 block correction; activation quantization applies
    to the base path in both, W8A8)."""
    from sparse_matrix_tuning_tpu.ops.quant import q8_matmul, q8_matmul_t

    lp, w0, _, cols, x, g_w, ci = _setup()
    valid = jnp.ones((3,), bool)
    wq, sw = quantize_weight(w0)
    wd = dequantize_weight(wq, sw, jnp.float32)
    base = jnp.take(wd, ci, axis=1)
    delta = np.asarray(cols - base)

    y = smt_channel_linear_dyn("oracle", x, cols, ci, valid,
                               {"wq": wq, "sw": sw}, base)
    x_sel = np.asarray(x)[:, np.asarray(ci)]
    want = np.asarray(q8_matmul_t(x, wq, sw)) + x_sel @ delta.T
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-5, atol=2e-5)

    # zero delta (cols == dequantized base) -> pure q8 forward
    y0 = smt_channel_linear_dyn("oracle", x, base, ci, valid,
                                {"wq": wq, "sw": sw}, base)
    np.testing.assert_allclose(np.asarray(y0),
                               np.asarray(q8_matmul_t(x, wq, sw)),
                               rtol=1e-6, atol=1e-6)

    # grads: cols get exact g^T x_sel; x gets q8 transpose + correction
    def loss(cols, x):
        return jnp.sum(smt_channel_linear_dyn(
            "oracle", x, cols, ci, valid, {"wq": wq, "sw": sw}, base) * g_w)

    g_cols, g_x = jax.grad(loss, argnums=(0, 1))(cols, x)
    np.testing.assert_allclose(np.asarray(g_cols),
                               np.asarray(g_w).T @ x_sel,
                               rtol=2e-5, atol=2e-5)
    want_gx = np.array(q8_matmul(g_w, wq, sw))
    for j, c in enumerate(lp.channels):
        want_gx[:, c] += np.asarray(g_w) @ delta[:, j]
    np.testing.assert_allclose(np.asarray(g_x), want_gx,
                               rtol=2e-4, atol=2e-4)


def test_channel_dyn_padded_entries_are_inert():
    lp, w0, base, cols, x, g_w, ci = _setup()
    ci4 = jnp.concatenate([ci, ci[:1]])
    valid4 = jnp.asarray([True, True, True, False])
    cols4 = jnp.concatenate([cols, cols[:, :1] + 123.0], axis=1)
    base4 = jnp.concatenate([base, base[:, :1]], axis=1)

    def loss4(cols4):
        y = smt_channel_linear_dyn("oracle", x, cols4, ci4, valid4,
                                   {"w": w0}, base4)
        return jnp.sum(y * g_w), y

    def loss3(cols):
        y = smt_channel_linear_dyn("oracle", x, cols, ci,
                                   jnp.ones((3,), bool), {"w": w0}, base)
        return jnp.sum(y * g_w), y

    (_, y4), g4 = jax.value_and_grad(loss4, has_aux=True)(cols4)
    (_, y3), g3 = jax.value_and_grad(loss3, has_aux=True)(cols)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g4[:, :3]), np.asarray(g3),
                               rtol=1e-6)
    assert np.all(np.asarray(g4[:, 3]) == 0.0)


# ---------------------------------------------------------------------------
# phase level
# ---------------------------------------------------------------------------

def channel_cfg(**kw):
    base = dict(matrix_sparsity=False, channel_sparsity=True,
                num_attention_channel=8, num_mlp_channel=8,
                saliency_accumulation="per_step_stats")
    base.update(kw)
    return smt_cfg(**base)


def _train(scan: str, n=8, fq="none", mesh=None, seed=0, **kw):
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = channel_cfg(scan_layers=scan, frozen_quant=fq, **kw)
    params = init_params(jax.random.PRNGKey(0), CFG)
    t = SMTTrainer(cfg, CFG, params, total_steps=n, mesh=mesh)
    losses = [float(t.train_step(b)["loss"])
              for b in make_batches(n, bsz=8, seed=seed)]
    return t, losses


def test_channel_scan_matches_unrolled_bf16():
    t_s, l_s = _train("on")
    t_u, l_u = _train("off")
    assert t_s._scan and not t_u._scan
    assert t_s.plan.mode == "channel"
    assert t_s.plan.fingerprint() == t_u.plan.fingerprint()
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)  # warm-up
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-3)
    assert l_s[-1] < l_s[0]


def test_channel_scan_grad_sum_matches_unrolled():
    """Channel grad_sum (positional (S, C) |activation| sums — the exact
    unrolled/reference accumulators) through the scan warm-up: taps are
    zero-padded to (max_seq_len, C) inside the scan body instead of being
    reduced; selection and losses match the unrolled grad_sum run."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = channel_cfg(scan_layers="on", saliency_accumulation="grad_sum")
    params = init_params(jax.random.PRNGKey(0), CFG)
    t_s = SMTTrainer(cfg, CFG, params, total_steps=8)
    assert t_s._scan_warmup == "channel"
    for mod, a in t_s.state["act_acc"].items():  # (L, S, C) positional
        w = t_s.state["master"]["layers_stacked"][mod]
        assert a.shape == (w.shape[0], cfg.max_seq_len, w.shape[2])
    l_s = [float(t_s.train_step(b)["loss"])
           for b in make_batches(8, bsz=8)]
    t_u, l_u = _train("off", saliency_accumulation="grad_sum")
    assert t_s._scan and not t_u._scan
    assert t_s.plan.fingerprint() == t_u.plan.fingerprint()
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-3)


def test_channel_scan_q8_offload_runs_and_exports():
    """int8 channel scan: frozen base quantized, dense weights offloaded to
    host, export reconstructs exact bf16 weights with trained columns."""
    t, losses = _train("on", fq="int8")
    assert t._scan and "q" in t.state
    assert t._host_frozen is not None
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # export: dense weights reconstructed; selected columns = trainable
    params = t.merged_params()
    idx = t.state["idx"]
    for mod, meta in idx.items():
        ci = np.asarray(meta["ci"])
        valid = np.asarray(meta["valid"])
        tcols = np.asarray(t.state["trainable"][mod])
        for l in range(CFG.num_hidden_layers):
            w = np.asarray(params["layers"][str(l)][mod], np.float32)
            for j in range(valid.shape[1]):
                if valid[l, j]:
                    np.testing.assert_allclose(
                        w[:, ci[l, j]],
                        tcols[l, :, j].astype(w.dtype).astype(np.float32),
                        rtol=1e-6)
    # eval runs the scan channel q8 forward
    ppl, loss = t.evaluate(iter(make_batches(2)))
    assert np.isfinite(loss)


def test_channel_scan_export_matches_unrolled():
    t_s, _ = _train("on")
    t_u, _ = _train("off")
    p_s = t_s.merged_params()
    p_u = t_u.merged_params()
    flat_s = jax.tree.leaves_with_path(p_s)
    flat_u = dict(jax.tree.leaves_with_path(p_u))
    assert len(flat_s) == len(flat_u)
    for path, v in flat_s:
        np.testing.assert_allclose(
            np.asarray(v, np.float32), np.asarray(flat_u[path], np.float32),
            rtol=2e-3, atol=1e-4, err_msg=str(path))


def test_channel_scan_checkpoint_resume():
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    batches = make_batches(8, bsz=8)
    t1 = SMTTrainer(channel_cfg(scan_layers="on"), CFG,
                    init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
    for b in batches[:4]:
        t1.train_step(b)
    assert t1._scan
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        t2 = SMTTrainer(channel_cfg(scan_layers="on"), CFG,
                        init_params(jax.random.PRNGKey(0), CFG),
                        total_steps=8)
        restore_checkpoint(d, t2)
    assert t2._scan and t2.phase == "sparse"
    l1 = [float(t1.train_step(b)["loss"]) for b in batches[4:]]
    l2 = [float(t2.train_step(b)["loss"]) for b in batches[4:]]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_channel_scan_on_mesh():
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    t, losses = _train("on", mesh=make_mesh((1, 4, 2)))
    assert t._scan and t.phase == "sparse"
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_channel_scan_auto_resolution():
    import dataclasses
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    from sparse_matrix_tuning_tpu.train.scan_phase import resolve_scan_layers
    deep = dataclasses.replace(LlamaConfig.tiny(), num_hidden_layers=32)
    assert resolve_scan_layers(channel_cfg(), deep, "channel")
    assert not resolve_scan_layers(channel_cfg(), CFG, "channel")  # shallow
    assert resolve_scan_layers(channel_cfg(scan_layers="on"), CFG, "channel")


def test_channel_unrolled_stays_unquantized():
    """The unrolled channel forward has no correction hook; int8 must not
    engage there (resolve_frozen_quant scan gate)."""
    from sparse_matrix_tuning_tpu.train.convert import resolve_frozen_quant
    cfg = channel_cfg(frozen_quant="int8")
    assert resolve_frozen_quant(cfg, "channel", scan=False) == "none"
    assert resolve_frozen_quant(cfg, "channel", scan=True) == "int8"


def test_channel_q8_eval_forward_matches_training_forward():
    """VERDICT r3 next #3 regression: the channel-q8 EVAL forward (scan
    eval step) computes the identical loss to the TRAINING forward on the
    same state/batch — eval quality numbers measure exactly what training
    optimized (no dense-vs-corrected drift)."""
    t, _ = _train("on", fq="int8")
    assert t.phase == "sparse" and "q" in t.state
    b = make_batches(1, bsz=8, seed=7)[0]
    _, eval_loss = t.evaluate(iter([b]))
    train_loss = float(t.train_step(b)["loss"])  # loss is pre-update
    # 2e-5: the training forward runs under value_and_grad with the
    # two-segment stop-grad scan (different XLA fusions than the plain
    # eval forward — ~4e-6 observed); a dense-vs-corrected dispatch drift
    # would be orders of magnitude larger (int8 quant error ~1e-2)
    np.testing.assert_allclose(eval_loss, train_loss, rtol=2e-5)
