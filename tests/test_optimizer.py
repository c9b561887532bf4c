"""Adam / clipping / schedule unit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.smt.optimizer import (
    AdamConfig, adam_init, adam_step, clip_by_global_norm, global_norm,
    make_lr_schedule, make_qk_lr_scale, full_ft_wd_mask,
)


def test_global_norm_and_clip():
    grads = {"a": jnp.full((3,), 3.0), "b": jnp.full((4,), 2.0)}
    n = float(global_norm(grads))
    assert n == pytest.approx(np.sqrt(9 * 3 + 4 * 4), rel=1e-6)
    clipped, norm = clip_by_global_norm(grads, 1.0)
    assert float(norm) == pytest.approx(n, rel=1e-6)
    assert float(global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)
    # under the threshold -> unchanged
    small = {"a": jnp.full((2,), 0.1)}
    clipped, _ = clip_by_global_norm(small, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), 0.1, rtol=1e-6)


def test_adam_matches_reference_formula():
    cfg = AdamConfig(betas=(0.9, 0.95), eps=1e-8, weight_decay=0.0)
    p = {"w": jnp.ones((2,), jnp.float32)}
    g = {"w": jnp.full((2,), 0.5, jnp.float32)}
    opt = adam_init(p)
    new_p, opt = adam_step(g, opt, p, jnp.asarray(0.1), cfg)
    # step 1: m=0.05, v=0.0125; m_hat=0.5, v_hat=0.25 -> update 1.0
    np.testing.assert_allclose(np.asarray(new_p["w"]), 1.0 - 0.1, rtol=1e-5)
    assert int(opt["count"]) == 1


def test_adam_weight_decay_and_masks():
    cfg = AdamConfig(betas=(0.9, 0.95), weight_decay=0.1)
    p = {"layers": {"0": {"q_proj": jnp.ones((2,)), "input_layernorm": jnp.ones((2,))}}}
    g = jax.tree.map(jnp.zeros_like, p)
    opt = adam_init(p)
    new_p, _ = adam_step(g, opt, p, jnp.asarray(1.0), cfg, wd_mask=full_ft_wd_mask)
    # zero grad: only decay applies, and only to q_proj
    assert float(new_p["layers"]["0"]["q_proj"][0]) == pytest.approx(0.9)
    assert float(new_p["layers"]["0"]["input_layernorm"][0]) == pytest.approx(1.0)


def test_qk_lr_scale():
    scale = make_qk_lr_scale(2)
    assert scale("3.q_proj") == 2.0
    assert scale("3.k_proj") == 2.0
    assert scale("3.v_proj") == 1.0
    assert scale("0.gate_proj") == 1.0


def test_linear_schedule():
    sched = make_lr_schedule("linear", 1.0, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(60)) == pytest.approx(0.5)
    assert float(sched(110)) == pytest.approx(0.0)


def test_cosine_schedule():
    sched = make_lr_schedule("cosine", 2.0, warmup_steps=0, total_steps=100)
    assert float(sched(0)) == pytest.approx(2.0)
    assert float(sched(50)) == pytest.approx(1.0, abs=1e-5)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_constant_schedule():
    sched = make_lr_schedule("constant", 3.0, warmup_steps=2, total_steps=100)
    assert float(sched(1)) == pytest.approx(1.5)
    assert float(sched(50)) == pytest.approx(3.0)
