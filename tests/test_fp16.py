"""fp16 dynamic loss scaling (DeepSpeed fp16-block semantics the reference
inherits, deepspeed_helpers.py:76-87): scale halves + step skips on
overflow, doubles after a window of good steps; training works end-to-end
in fp16."""
import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule
from sparse_matrix_tuning_tpu.train.steps import (
    build_warmup_step, init_warmup_state, update_loss_scale,
)
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, make_batches, smt_cfg


def test_update_loss_scale_rule():
    s, g = update_loss_scale(jnp.float32(65536.0), jnp.int32(5),
                             jnp.bool_(False), window=2000)
    assert float(s) == 32768.0 and int(g) == 0          # overflow: halve+reset
    s, g = update_loss_scale(jnp.float32(1.0), jnp.int32(0),
                             jnp.bool_(False), window=2000)
    assert float(s) == 1.0                              # min scale floor
    s, g = update_loss_scale(jnp.float32(1024.0), jnp.int32(10),
                             jnp.bool_(True), window=2000)
    assert float(s) == 1024.0 and int(g) == 11          # good step: count up
    s, g = update_loss_scale(jnp.float32(1024.0), jnp.int32(1999),
                             jnp.bool_(True), window=2000)
    assert float(s) == 2048.0 and int(g) == 0           # window: double+reset


def test_overflow_step_is_skipped():
    cfg = smt_cfg(dtype="fp16")
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_warmup_state(params, cfg)
    assert float(state["loss_scale"]) == 2.0 ** 16
    # force overflow: scaled loss exceeds fp32 max
    state["loss_scale"] = jnp.asarray(3.0e38, jnp.float32)
    step = jax.jit(build_warmup_step(cfg, CFG,
                                     make_lr_schedule("constant", 1e-3, 0, 4)))
    before = np.asarray(state["master"]["layers"]["0"]["q_proj"])
    new_state, m = step(state, make_batches(1)[0])
    assert bool(m["overflow"])
    # params untouched, scale halved, adam count unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state["master"]["layers"]["0"]["q_proj"]), before)
    assert float(new_state["loss_scale"]) == float(np.float32(3.0e38) * 0.5)
    assert int(new_state["count"]) == 0
    assert int(new_state["good_steps"]) == 0
    # accumulators also skipped
    np.testing.assert_array_equal(np.asarray(new_state["acc"]["0.q_proj"]),
                                  0.0)


def test_fp16_two_phase_training():
    cfg = smt_cfg(dtype="fp16", ft_learning_rate=1e-3, smt_lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=8)
    losses = [float(trainer.train_step(b)["loss"]) for b in make_batches(8)]
    assert trainer.phase == "sparse"
    assert "loss_scale" in trainer.state  # fresh phase-2 scaler
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fp16_scan_matches_unrolled():
    """fp16 dynamic loss scaling now runs in the scan phases too: scan and
    unrolled fp16 two-phase runs agree (fp16 forward -> looser tolerance),
    and the phase-2 scaler leaf exists in the scan state."""
    losses = {}
    for scan in ("on", "off"):
        cfg = smt_cfg(dtype="fp16", ft_learning_rate=1e-3, smt_lr=1e-2,
                      scan_layers=scan)
        params = init_params(jax.random.PRNGKey(0), CFG)
        t = SMTTrainer(cfg, CFG, params, total_steps=8)
        losses[scan] = [float(t.train_step(b)["loss"])
                        for b in make_batches(8, bsz=8)]
        assert "loss_scale" in t.state
        assert np.isfinite(losses[scan]).all()
    np.testing.assert_allclose(losses["on"][:2], losses["off"][:2], rtol=1e-3)
    np.testing.assert_allclose(losses["on"][2:], losses["off"][2:], rtol=3e-2)


def test_fp16_scan_sparse_overflow_skipped():
    """A forced overflow in the SCAN sparse phase skips the update and
    halves the scale (same semantics as the unrolled step)."""
    cfg = smt_cfg(dtype="fp16", scan_layers="on")
    params = init_params(jax.random.PRNGKey(0), CFG)
    t = SMTTrainer(cfg, CFG, params, total_steps=8)
    for b in make_batches(3, bsz=8):
        t.train_step(b)
    assert t.phase == "sparse" and t._scan
    state = dict(t.state)
    state["loss_scale"] = jnp.asarray(3.0e38, jnp.float32)
    before = {k: np.asarray(v) for k, v in state["trainable"].items()}
    scale_before = float(state["loss_scale"])
    count_before = int(state["count"])  # the jitted step donates `state`
    new_state, m = t._sparse_step(state, make_batches(1, bsz=8)[0])
    assert bool(m["overflow"])
    for k in before:
        np.testing.assert_array_equal(np.asarray(new_state["trainable"][k]),
                                      before[k])
    assert float(new_state["loss_scale"]) == float(np.float32(scale_before) * 0.5)
    assert int(new_state["count"]) == count_before
