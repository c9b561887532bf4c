"""Scan-over-layers sparse phase (train/scan_phase.py): parity with the
unrolled phase, export equivalence, checkpoint resume, and mesh run."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches, smt_cfg


def _train(scan: str, n=8, fq="none", mesh=None, seed=0, **kw):
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = smt_cfg(scan_layers=scan, frozen_quant=fq, **kw)
    params = init_params(jax.random.PRNGKey(0), CFG)
    t = SMTTrainer(cfg, CFG, params, total_steps=n, mesh=mesh)
    losses = [float(t.train_step(b)["loss"])
              for b in make_batches(n, bsz=8, seed=seed)]
    return t, losses


def test_scan_matches_unrolled_bf16():
    t_s, l_s = _train("on")
    t_u, l_u = _train("off")
    assert t_s._scan and not t_u._scan
    assert t_s.plan.fingerprint() == t_u.plan.fingerprint()
    # warm-up identical; sparse phase identical math, different fp
    # association (frozen-base+delta vs scattered dense)
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-3)
    assert l_s[-1] < l_s[0]


def test_scan_matches_unrolled_q8():
    t_s, l_s = _train("on", fq="int8")
    t_u, l_u = _train("off", fq="int8")
    assert "q" in t_s.state and t_s._scan
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-2)
    assert l_s[-1] < l_s[0]


def _train_dropout(scan: str, saliency="auto", n=8):
    import dataclasses

    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg_m = dataclasses.replace(CFG, attention_dropout=0.1)
    cfg = smt_cfg(scan_layers=scan, dropout=0.1,
                  saliency_accumulation=saliency)
    params = init_params(jax.random.PRNGKey(0), cfg_m)
    t = SMTTrainer(cfg, cfg_m, params, total_steps=n)
    return t, [float(t.train_step(b)["loss"]) for b in make_batches(n)]


def test_scan_matches_unrolled_dropout():
    """Dropout through the scan sparse phase: forward_scan folds per-layer
    keys from the scanned ABSOLUTE layer index — the identical fold_in
    stream the unrolled forward uses, so losses agree at equal seeds."""
    t_s, l_s = _train_dropout("on")
    t_u, l_u = _train_dropout("off")
    assert t_s._scan and not t_u._scan
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)  # same warm-up
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-3)
    # dropout actually engages: a dropout-free run diverges from step 1
    from test_train_e2e import run_training
    _, l_nodrop = run_training(smt_cfg(scan_layers="off"))
    assert abs(l_nodrop[0] - l_u[0]) > 1e-6


def test_scan_warmup_dropout_matches_unrolled():
    """per_step_stats saliency engages the SCAN WARM-UP too; dropout masks
    must match the unrolled warm-up's (same fold streams)."""
    t_s, l_s = _train_dropout("on", saliency="per_step_stats")
    t_u, l_u = _train_dropout("off", saliency="per_step_stats")
    assert t_s._scan
    np.testing.assert_allclose(l_s, l_u, rtol=3e-3)
    assert t_s.plan.fingerprint() == t_u.plan.fingerprint()


def test_scan_warmup_grad_sum_matches_unrolled():
    """grad_sum (reference-exact full fp32 accumulators, fine_tune.py:
    729-740) rides the scan warm-up too: stacked (L, R, C) grad sums —
    the stacked grad IS the per-layer grad — so selection and losses
    match the unrolled grad_sum run while compile stays O(1-layer)."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = smt_cfg(scan_layers="on", saliency_accumulation="grad_sum")
    params = init_params(jax.random.PRNGKey(0), CFG)
    t_s = SMTTrainer(cfg, CFG, params, total_steps=8)
    assert t_s._scan_warmup == "matrix"
    for mod, a in t_s.state["acc"].items():  # full sums, not block stats
        assert a.shape == t_s.state["master"]["layers_stacked"][mod].shape
    l_s = [float(t_s.train_step(b)["loss"])
           for b in make_batches(8, bsz=8)]
    t_u, l_u = _train("off", saliency_accumulation="grad_sum")
    assert t_s._scan and not t_u._scan
    assert t_s.plan.fingerprint() == t_u.plan.fingerprint()
    np.testing.assert_allclose(l_s[:2], l_u[:2], rtol=1e-6)
    np.testing.assert_allclose(l_s[2:], l_u[2:], rtol=2e-3)
    assert l_s[-1] < l_s[0]


def test_scan_export_matches_unrolled():
    # atol 5e-4: since grad_sum rides the scan warm-up, BOTH phases differ
    # from the unrolled run by fp association only (scan vs unrolled layer
    # loop); tiny weights can drift ~2e-4 over 8 Adam steps
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
            rtol=2e-3, atol=5e-4, err_msg=str(path))


def test_scan_q8_offload_and_export():
    """int8 + scan: stacked dense weights leave the device; export still
    reconstructs full dense weights with the trained blocks."""
    t, losses = _train("on", fq="int8")
    assert t._host_frozen is not None
    for mod in t.state["q"]:
        assert t.state["params"]["layers_stacked"][mod].shape[1] == 1
        assert t._host_frozen[mod].ndim == 3
    assert np.isfinite(losses).all()
    params = t.merged_params()
    for li, layer in params["layers"].items():
        for mod, w in layer.items():
            if not (mod.endswith("layernorm") or mod.endswith("_bias")):
                assert w.ndim == 2 and w.shape[0] > 1
    # eval runs the scan q8 forward
    ppl, loss = t.evaluate(iter(make_batches(2)))
    assert np.isfinite(loss)


def test_scan_checkpoint_resume():
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = smt_cfg(scan_layers="on", frozen_quant="int8")
    batches = make_batches(8, bsz=8)
    t1 = SMTTrainer(cfg, CFG, init_params(jax.random.PRNGKey(0), CFG),
                    total_steps=8)
    for b in batches[:4]:
        t1.train_step(b)
    assert t1._scan
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        t2 = SMTTrainer(smt_cfg(scan_layers="on", frozen_quant="int8"), CFG,
                        init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
        restore_checkpoint(d, t2)
    assert t2._scan and t2.phase == "sparse"
    l1 = [float(t1.train_step(b)["loss"]) for b in batches[4:]]
    l2 = [float(t2.train_step(b)["loss"]) for b in batches[4:]]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_scan_on_mesh():
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    t, losses = _train("on", mesh=make_mesh((1, 4, 2)))
    assert t._scan and t.phase == "sparse"
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_scan_auto_resolution():
    import dataclasses
    from sparse_matrix_tuning_tpu.train.scan_phase import resolve_scan_layers
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    deep = dataclasses.replace(LlamaConfig.tiny(), num_hidden_layers=32)
    assert resolve_scan_layers(smt_cfg(), deep, "matrix")
    assert not resolve_scan_layers(smt_cfg(), CFG, "matrix")  # 2 layers
    assert resolve_scan_layers(smt_cfg(), deep, "channel")  # since r3
    assert not resolve_scan_layers(smt_cfg(scan_layers="off"), deep, "matrix")
    # fp16 supported since the scan loss-scaler landed; dropout since the
    # scanned-layer-index fold landed (both phases)
    assert resolve_scan_layers(smt_cfg(dtype="fp16"), deep, "matrix")
    assert resolve_scan_layers(smt_cfg(dropout=0.1), deep, "matrix")
    assert resolve_scan_layers(smt_cfg(scan_layers="on", dropout=0.1), deep,
                               "matrix")
    with pytest.raises(ValueError):
        resolve_scan_layers(smt_cfg(scan_layers="on"), deep, "none")
