"""Quantize-on-load (scan_phase.build_scan_state_from_hf +
SMTTrainer.sparse_scan_from_hf): stream a base HF checkpoint straight into
the int8 scan sparse state without materializing full-precision weights on
device — the single-chip 8B sparse-continuation flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_e2e import CFG, make_batches, smt_cfg


@pytest.fixture()
def base_ckpt(tmp_path):
    from sparse_matrix_tuning_tpu.models.llama import init_params
    from sparse_matrix_tuning_tpu.models.hf_io import save_hf_format
    params = init_params(jax.random.PRNGKey(0), CFG)
    save_hf_format(params, CFG, str(tmp_path))
    return str(tmp_path), params


def _synthetic_plan():
    from sparse_matrix_tuning_tpu.smt.plan import LinearPlan, SMTPlan
    rng = np.random.default_rng(3)
    linears = {}
    for li in range(CFG.num_hidden_layers):
        for mod, (o, i) in (("q_proj", (256, 256)), ("gate_proj", (512, 256))):
            grid = (o // 256, i // 256)
            picks = {(int(rng.integers(0, grid[0])), int(rng.integers(0, grid[1])))}
            linears[f"{li}.{mod}"] = LinearPlan(mod, li, o, i,
                                                blocks=tuple(sorted(picks)))
    return SMTPlan(mode="matrix", linears=linears)


def test_state_matches_in_memory_builder(base_ckpt):
    from sparse_matrix_tuning_tpu.train.scan_phase import (
        build_scan_sparse_state, build_scan_state_from_hf,
        offload_scan_frozen_to_host)

    model_dir, params = base_ckpt
    plan = _synthetic_plan()
    cfg = smt_cfg(frozen_quant="int8", scan_layers="on")

    got, host = build_scan_state_from_hf(cfg, model_dir, plan, CFG)
    master = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    want = build_scan_sparse_state(cfg, {"master": master, "step": 0},
                                   plan, CFG)
    want, _ = offload_scan_frozen_to_host(want, keep_host=False)

    for mod in want["q"]:
        np.testing.assert_array_equal(np.asarray(got["q"][mod]["wq"]),
                                      np.asarray(want["q"][mod]["wq"]),
                                      err_msg=mod)
        np.testing.assert_allclose(np.asarray(got["q"][mod]["sw"]),
                                   np.asarray(want["q"][mod]["sw"]),
                                   rtol=1e-6, err_msg=mod)
    for mod in want["trainable"]:
        np.testing.assert_allclose(np.asarray(got["trainable"][mod]),
                                   np.asarray(want["trainable"][mod]),
                                   rtol=1e-6, err_msg=mod)
        np.testing.assert_allclose(np.asarray(got["base"][mod]),
                                   np.asarray(want["base"][mod]),
                                   rtol=1e-6, err_msg=mod)
    # host store: every quantized layer module + the offloaded untied
    # bf16 lm_head (head_quant)
    assert set(host) == set(want["q"]) | {"lm_head"}
    np.testing.assert_array_equal(host["lm_head"],
                                  np.asarray(params["lm_head"]))
    assert got["params"]["lm_head"].shape == (1,)  # placeholder on device


def test_sparse_scan_from_hf_trains_and_exports(base_ckpt):
    from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

    model_dir, params = base_ckpt
    plan = _synthetic_plan()
    cfg = smt_cfg(frozen_quant="int8", scan_layers="on")
    t = SMTTrainer.sparse_scan_from_hf(cfg, model_dir, plan, total_steps=6,
                                       model_cfg=CFG)
    assert t.phase == "sparse" and t._scan and t._host_frozen is not None

    losses = [float(t.train_step(b)["loss"]) for b in make_batches(6, bsz=8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    ppl, loss = t.evaluate(iter(make_batches(2)))
    assert np.isfinite(loss)

    merged = t.merged_params()
    # frozen (unplanned) weights export bit-exactly from the base ckpt
    base_w = np.asarray(params["layers"]["0"]["up_proj"],
                        np.float32)
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["0"]["up_proj"], np.float32), base_w)


def test_cli_flag_parses():
    from sparse_matrix_tuning_tpu.config import parse_args
    cfg = parse_args(["--model_name_or_path", "x", "--data_path", "d.json",
                      "--matrix_sparsity", "--sparse_from_plan", "p.json"])
    assert cfg.sparse_from_plan == "p.json"
