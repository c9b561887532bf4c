"""Int8 frozen lm-head for the sparse-phase dense loss (head_quant).

The head is frozen in the sparse phase (only selected blocks/channels
train), so like every other frozen linear it can run on the MXU int8 path
— measured head+loss f+b 30.8 -> 20.1 ms at bench geometry (V=32000,
T=8192) on the v5e. Exports and eval-CLI generation keep the exact bf16
head (merged_params never reads q_head). Reference analogue: none — its
lm_head stays fp16/bf16 like every frozen weight (smt.py:366)."""
import json
import os
import tempfile

import jax
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches, run_training, smt_cfg


def test_resolve_head_quant_gating():
    """auto: int8 iff the frozen base is int8; explicit values always win."""
    from sparse_matrix_tuning_tpu.train.convert import resolve_head_quant

    cfg = smt_cfg()
    assert resolve_head_quant(cfg, CFG, "int8") == "int8"
    assert resolve_head_quant(cfg, CFG, "none") == "none"
    assert resolve_head_quant(smt_cfg(head_quant="none"), CFG, "int8") == "none"
    assert resolve_head_quant(smt_cfg(head_quant="int8"), CFG, "none") == "int8"
    # both loss paths consume q_head now (chunked runs the int8-per-chunk
    # online LSE), so the loss policy no longer gates the resolve
    assert resolve_head_quant(smt_cfg(loss_impl="chunked"), CFG, "int8") == "int8"


def test_sparse_training_with_q8_head():
    """End-to-end: q_head lands in the state, losses stay finite and
    decrease, and the q8-head objective tracks the exact-head one."""
    t_q, l_q = run_training(smt_cfg(frozen_quant="int8", head_quant="int8"))
    t_e, l_e = run_training(smt_cfg(frozen_quant="int8", head_quant="none"))
    assert t_q.phase == "sparse" and "q_head" in t_q.state
    assert "q_head" not in t_e.state
    assert np.all(np.isfinite(l_q))
    # warm-up is identical (head quant is a sparse-phase policy)
    np.testing.assert_allclose(l_q[:2], l_e[:2], rtol=1e-6)
    # sparse losses differ only by int8 head quantization error
    np.testing.assert_allclose(l_q[2:], l_e[2:], rtol=5e-2)
    assert l_q[-1] < l_q[2]


def test_q8_head_loss_close_to_exact():
    """Direct loss comparison on one converted state: the int8 head changes
    the loss by at most the logit-quantization error."""
    from sparse_matrix_tuning_tpu.train.steps import build_eval_step

    t, _ = run_training(smt_cfg(frozen_quant="int8", head_quant="int8"))
    batch = make_batches(1, bsz=8, seed=9)[0]
    cfg = t.cfg
    loss_q = float(jax.jit(build_eval_step(cfg, CFG, t.plan))(t.state, batch))
    state_exact = {k: v for k, v in t.state.items() if k != "q_head"}
    if t._host_frozen is not None and "lm_head" in t._host_frozen:
        # the bf16 head was offloaded with q_head active — put it back on
        # device for the exact-head comparison run
        import jax.numpy as jnp
        params = dict(state_exact["params"])
        params["lm_head"] = jnp.asarray(t._host_frozen["lm_head"])
        state_exact["params"] = params
    loss_e = float(jax.jit(build_eval_step(cfg, CFG, t.plan))(state_exact, batch))
    assert abs(loss_q - loss_e) < 0.05 * max(loss_e, 1.0)
    assert loss_q != loss_e  # the int8 path genuinely engaged


def test_eval_loss_matches_training_forward():
    """The sparse-phase eval step runs the SAME forward as training (int8
    head included): eval loss on the training batch == the next train-step
    loss reported for that batch (before the update)."""
    cfg = smt_cfg(frozen_quant="int8", head_quant="int8")
    t, _ = run_training(cfg, n_steps=4)
    batch = make_batches(1, bsz=8, seed=4)[0]
    ev = t.evaluate([batch])[1]
    m = t.train_step(batch)
    np.testing.assert_allclose(ev, float(m["loss"]), rtol=1e-6)


def test_scan_q8_head_matches_unrolled():
    """Scan and unrolled q8-head paths compute the same objective."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    losses = {}
    for scan in ("on", "off"):
        cfg = smt_cfg(scan_layers=scan, frozen_quant="int8", head_quant="int8")
        params = init_params(jax.random.PRNGKey(0), CFG)
        t = SMTTrainer(cfg, CFG, params, total_steps=8)
        losses[scan] = [float(t.train_step(b)["loss"])
                        for b in make_batches(8, bsz=8)]
        assert "q_head" in t.state
    np.testing.assert_allclose(losses["on"][:2], losses["off"][:2], rtol=1e-6)
    np.testing.assert_allclose(losses["on"][2:], losses["off"][2:], rtol=2e-2)


def test_checkpoint_roundtrip_with_q_head():
    """A sparse checkpoint with q_head restores into a warm-up trainer with
    the same flags; the restored step function reproduces the loss."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = smt_cfg(frozen_quant="int8", head_quant="int8")
    t1, _ = run_training(cfg, n_steps=4)
    assert "q_head" in t1.state
    batch = make_batches(1, bsz=8, seed=11)[0]
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        with open(os.path.join(d, "meta.json")) as f:
            assert json.load(f)["resolved"]["head_quant"] == "int8"
        t2 = SMTTrainer(smt_cfg(frozen_quant="int8", head_quant="int8"), CFG,
                        init_params(jax.random.PRNGKey(1), CFG), total_steps=8)
        restore_checkpoint(d, t2)
        assert "q_head" in t2.state
        np.testing.assert_allclose(np.asarray(t1.state["q_head"]["wq"]),
                                   np.asarray(t2.state["q_head"]["wq"]))
        np.testing.assert_allclose(t1.evaluate([batch])[1],
                                   t2.evaluate([batch])[1], rtol=1e-6)


def test_restore_rejects_head_quant_mismatch():
    """head_quant resolved differently at restore fails with an actionable
    message (same guard family as frozen_quant/scan mismatches)."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    t1, _ = run_training(smt_cfg(frozen_quant="int8", head_quant="int8"),
                         n_steps=4)
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        t2 = SMTTrainer(smt_cfg(frozen_quant="int8", head_quant="none"), CFG,
                        init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
        with pytest.raises(ValueError, match="head_quant"):
            restore_checkpoint(d, t2)


def test_export_keeps_exact_bf16_head():
    """merged_params never reads q_head: the exported head equals the
    warm-up-trained head bit-for-bit (the head is frozen in phase 2).
    With host offload active (untied model + q_head) the bf16 head lives
    in the host store and the device copy is a placeholder."""
    t, _ = run_training(smt_cfg(frozen_quant="int8", head_quant="int8"))
    from sparse_matrix_tuning_tpu.models.llama import lm_head_weight
    exported = np.asarray(lm_head_weight(t.merged_params(), CFG))
    if t._host_frozen is not None and "lm_head" in t._host_frozen:
        assert t.state["params"]["lm_head"].shape == (1,)  # offloaded
        np.testing.assert_array_equal(exported, t._host_frozen["lm_head"])
    else:
        np.testing.assert_array_equal(
            exported, np.asarray(lm_head_weight(t.state["params"], CFG)))


def test_chunked_q8_head_e2e():
    """loss_impl=chunked no longer disables the q8 head: the chunked-q8
    online-LSE path trains end-to-end."""
    t, l = run_training(smt_cfg(frozen_quant="int8", loss_impl="chunked"))
    assert t.phase == "sparse" and "q_head" in t.state
    assert np.all(np.isfinite(l))
    assert l[-1] < l[2]


def test_scan_chunked_q8_head_matches_unrolled():
    """Scan and unrolled agree through the chunked-q8 loss too."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    losses = {}
    for scan in ("on", "off"):
        cfg = smt_cfg(scan_layers=scan, frozen_quant="int8",
                      loss_impl="chunked")
        params = init_params(jax.random.PRNGKey(0), CFG)
        t = SMTTrainer(cfg, CFG, params, total_steps=8)
        losses[scan] = [float(t.train_step(b)["loss"])
                        for b in make_batches(8, bsz=8)]
        assert "q_head" in t.state
    np.testing.assert_allclose(losses["on"][:2], losses["off"][:2], rtol=1e-6)
    np.testing.assert_allclose(losses["on"][2:], losses["off"][2:], rtol=2e-2)


def test_q8_head_over_bf16_base():
    """Explicit --head_quant int8 works over a bf16 frozen base (the head
    path is independent of frozen_quant), and the checkpoint guard is
    consistent: a same-flags restore round-trips."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg_kw = dict(frozen_quant="none", head_quant="int8")
    t, l = run_training(smt_cfg(**cfg_kw))
    assert t.phase == "sparse"
    assert "q_head" in t.state and "q" not in t.state
    assert np.all(np.isfinite(l)) and l[-1] < l[2]
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t)
        t2 = SMTTrainer(smt_cfg(**cfg_kw), CFG,
                        init_params(jax.random.PRNGKey(1), CFG),
                        total_steps=8)
        restore_checkpoint(d, t2)
        assert "q_head" in t2.state and "q" not in t2.state


def test_pre_head_quant_checkpoint_restores():
    """A checkpoint whose meta predates head_quant (no key in resolved)
    restores cleanly with --head_quant none, and fails with the actionable
    guard (not an orbax structure error) when the resolution differs."""
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    t1, _ = run_training(smt_cfg(frozen_quant="int8", head_quant="none"),
                         n_steps=4)
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, t1)
        meta_path = os.path.join(d, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        del meta["resolved"]["head_quant"]  # simulate the old format
        with open(meta_path, "w") as f:
            json.dump(meta, f)

        ok = SMTTrainer(smt_cfg(frozen_quant="int8", head_quant="none"), CFG,
                        init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
        restore_checkpoint(d, ok)
        assert "q_head" not in ok.state

        bad = SMTTrainer(smt_cfg(frozen_quant="int8", head_quant="int8"), CFG,
                         init_params(jax.random.PRNGKey(0), CFG), total_steps=8)
        with pytest.raises(ValueError, match="head_quant"):
            restore_checkpoint(d, bad)
