"""Host offload of the frozen bf16 dense weights in the int8 sparse phase
(train/convert.py offload_frozen_to_host): device state keeps only the int8
copy; export reconstructs exact bf16 weights on host. No reference analogue
(the reference's frozen weights stay in device memory as the forward
operand, deepspeed/smt/smt.py:366) — this is what buys the HBM headline.
"""
import jax
import jax.numpy as jnp
import numpy as np

from test_train_e2e import CFG, make_batches, smt_cfg


def _run(offload: bool, n=6):
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    cfg = smt_cfg(frozen_quant="int8", frozen_host_offload=offload)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=n)
    losses = [float(trainer.train_step(b)["loss"]) for b in make_batches(n)]
    return trainer, losses


def test_offload_state_and_training_identical_to_resident():
    t_off, l_off = _run(True)
    t_res, l_res = _run(False)
    assert t_off._host_frozen is not None and t_res._host_frozen is None

    # every quantized dense weight left the device as a (1,) placeholder
    for ks in t_off.state["q"]:
        li, mod = ks.split(".", 1)
        assert t_off.state["params"]["layers"][li][mod].shape == (1,)
        assert t_off._host_frozen[ks].ndim == 2
        assert t_res.state["params"]["layers"][li][mod].ndim == 2

    # the q8 compute path never reads the dense weights, so training is
    # bit-equivalent with and without offload
    np.testing.assert_allclose(l_off, l_res, rtol=1e-6)


def test_offload_export_matches_resident_export():
    t_off, _ = _run(True)
    t_res, _ = _run(False)
    p_off = t_off.merged_params()
    p_res = t_res.merged_params()
    flat_off = jax.tree.leaves_with_path(p_off)
    flat_res = dict(jax.tree.leaves_with_path(p_res))
    assert len(flat_off) == len(flat_res)
    for path, v in flat_off:
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(flat_res[path], np.float32),
            err_msg=str(path))


def test_offload_eval_runs_q8_forward():
    t_off, _ = _run(True)
    batches = make_batches(2)
    ppl, loss = t_off.evaluate(iter(batches))
    assert np.isfinite(loss) and np.isfinite(ppl)
    # eval uses the same q8-corrected forward as training: close to (but in
    # general not bitwise-equal to) the exact bf16 dense eval
    t_res, _ = _run(False)
    _, loss_res = t_res.evaluate(iter(batches))
    np.testing.assert_allclose(loss, loss_res, rtol=0.05)


def test_offload_inactive_on_mesh():
    from sparse_matrix_tuning_tpu.train.convert import frozen_offload_active
    from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
    cfg = smt_cfg(frozen_quant="int8")
    assert frozen_offload_active(cfg, "matrix", None)
    assert not frozen_offload_active(cfg, "matrix", make_mesh((2, 2, 2)))
    assert not frozen_offload_active(cfg, "channel", None)
    assert not frozen_offload_active(
        smt_cfg(frozen_quant="int8", frozen_host_offload=False), "matrix", None)
