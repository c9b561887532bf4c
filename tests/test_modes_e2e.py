"""Mode-matrix e2e coverage: mixture, qk-scheduler, norm_dist, eval under a
mesh, and selection-strategy differences."""
import jax
import numpy as np

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.parallel.mesh import make_mesh
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

from test_train_e2e import CFG, make_batches, smt_cfg


def run(cfg, n_steps=6, seed=0, mesh=None, bsz=4):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=n_steps, mesh=mesh)
    losses = [float(trainer.train_step(b)["loss"])
              for b in make_batches(n_steps, bsz=bsz)]
    return trainer, losses


def test_mixture_mode():
    cfg = smt_cfg(no_limit_mixture=True,
                  downsample_attention_blocks_ratio=0.05,
                  downsample_mlp_blocks_ratio=0.05)
    trainer, losses = run(cfg)
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()
    # mixture selects over the union with the combined budget
    modules = {lp.module for lp in trainer.plan.linears.values()}
    assert modules  # some selection happened across the union


def test_qk_scheduler_boosts_qk_lr():
    cfg = smt_cfg(qk_scheduler=True, qk_lr_times=4,
                  downsample_attention_blocks_ratio=0.2,
                  downsample_mlp_blocks_ratio=0.05)
    trainer, losses = run(cfg)
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()


def test_norm_dist_selects_per_tensor():
    cfg = smt_cfg(selection_strategy="norm_dist",
                  downsample_attention_blocks_ratio=0.05,
                  downsample_mlp_blocks_ratio=0.05)
    trainer, _ = run(cfg)
    # norm_dist takes top-n PER tensor: every eligible tensor appears
    per_tensor_counts = {ks: lp.n_blocks for ks, lp in trainer.plan.linears.items()}
    assert len(set(per_tensor_counts.values())) == 1  # same n per tensor


def test_calculate_strategies_run():
    for strat in ("abs_mean", "L1", "L2"):
        cfg = smt_cfg(calculate_strategy=strat)
        trainer, losses = run(cfg, n_steps=3)
        assert trainer.phase == "sparse"
        assert np.isfinite(losses).all()


def test_eval_under_mesh():
    mesh = make_mesh((2, 2, 2))
    cfg = smt_cfg()
    trainer, _ = run(cfg, n_steps=4, mesh=mesh, bsz=8)
    ppl, loss = trainer.evaluate(make_batches(2, bsz=8, seed=3))
    assert np.isfinite(loss) and ppl > 0


def test_seq_bucket_switching():
    """Different-length batches hit different buckets (recompiles, not
    crashes), and losses stay finite."""
    cfg = smt_cfg(max_seq_len=64, seq_buckets=[32, 64])
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=6)
    short = make_batches(3, seq=32)
    long = make_batches(3, seq=64)
    for b in [short[0], long[0], short[1], long[1]]:
        m = trainer.train_step(b)
        assert np.isfinite(float(m["loss"]))
    assert trainer.phase == "sparse"


def test_per_step_stats_saliency_mode():
    """Low-memory accumulation: block-grid accumulators, same planted-block
    selection, training proceeds."""
    cfg = smt_cfg(saliency_accumulation="per_step_stats")
    trainer, losses = run(cfg)
    assert trainer.phase == "sparse"
    assert np.isfinite(losses).all()
    # accumulator in this mode is (R/256, C/256), so conversion worked from
    # the reduced stats; selection must be deterministic across runs
    t2, _ = run(cfg)
    assert trainer.plan.fingerprint() == t2.plan.fingerprint()


def test_per_step_stats_accumulator_is_tiny():
    from sparse_matrix_tuning_tpu.train.steps import init_warmup_state
    from sparse_matrix_tuning_tpu.models.llama import init_params as ip
    cfg = smt_cfg(saliency_accumulation="per_step_stats")
    state = init_warmup_state(ip(jax.random.PRNGKey(0), CFG), cfg)
    # gate_proj is (512, 256) -> block grid (2, 1)
    assert state["acc"]["0.gate_proj"].shape == (2, 1)
    cfg2 = smt_cfg()
    state2 = init_warmup_state(ip(jax.random.PRNGKey(0), CFG), cfg2)
    assert state2["acc"]["0.gate_proj"].shape == (512, 256)


def test_per_step_stats_channel_mode():
    cfg = smt_cfg(matrix_sparsity=False, channel_sparsity=True,
                  num_attention_channel=8, num_mlp_channel=8,
                  saliency_accumulation="per_step_stats")
    trainer, losses = run(cfg)
    assert trainer.phase == "sparse" and trainer.plan.mode == "channel"
    assert np.isfinite(losses).all()
    t2, _ = run(cfg)
    assert trainer.plan.fingerprint() == t2.plan.fingerprint()

    # accumulator is (C,) in this mode
    from sparse_matrix_tuning_tpu.train.steps import init_warmup_state
    state = init_warmup_state(init_params(jax.random.PRNGKey(0), CFG), cfg)
    assert state["act_acc"]["0.gate_proj"].shape == (256,)


def test_per_step_stats_mean_abs_selection_matches_grad_sum():
    """Round-4 exactness: with the default mean_abs strategy (and the
    attention mean_abs quirk), per_step_stats accumulates signed block
    means (select.block_stats_step), so the selection is identical to the
    reference-exact grad_sum mode — the auto policy's at-scale fallback no
    longer changes which blocks are picked."""
    t_ps, _ = run(smt_cfg(saliency_accumulation="per_step_stats"), n_steps=4)
    t_gs, _ = run(smt_cfg(saliency_accumulation="grad_sum"), n_steps=4)
    assert t_ps.plan.fingerprint() == t_gs.plan.fingerprint()
