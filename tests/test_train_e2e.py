"""End-to-end two-phase training on a tiny model (the reference's only real
"test" is the training command itself — SURVEY.md §4; here it is automated:
warm-up -> deterministic selection -> sparse training loss decreases ->
frozen weights untouched -> merged export).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.config import SMTConfig
from sparse_matrix_tuning_tpu.models.llama import LlamaConfig, init_params
from sparse_matrix_tuning_tpu.smt.plan import BLOCK
from sparse_matrix_tuning_tpu.train.trainer import SMTTrainer

CFG = LlamaConfig.tiny(vocab_size=256)


def make_batches(n, bsz=4, seq=32, vocab=256, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ids = rng.integers(3, vocab, (bsz, seq)).astype(np.int32)
        # make it learnable: repeat a short pattern
        ids[:, ::2] = 7
        labels = ids.copy()
        labels[:, : seq // 4] = -100
        out.append({"input_ids": ids, "labels": labels,
                    "attention_mask": np.ones((bsz, seq), np.int32)})
    return out


def smt_cfg(**kw):
    base = dict(
        data_path=["x.json"], model_name_or_path="tiny", dtype="fp32",
        matrix_sparsity=True, full_ft_steps=2,
        downsample_attention_blocks_ratio=0.05,
        downsample_mlp_blocks_ratio=0.05,
        ft_learning_rate=1e-3, smt_lr=1e-2, lr_scheduler_type="constant",
        eval_step=0, save_steps=0, gradient_checkpointing=False,
        max_seq_len=32, seq_buckets=[32], seed=0,
    )
    base.update(kw)
    return SMTConfig(**base)


def run_training(cfg, n_steps=8, seed=0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=n_steps)
    losses = []
    for batch in make_batches(n_steps):
        m = trainer.train_step(batch)
        losses.append(float(m["loss"]))
    return trainer, losses


def test_two_phase_training_loss_decreases():
    trainer, losses = run_training(smt_cfg())
    assert trainer.phase == "sparse"
    assert trainer.plan is not None and trainer.plan.trainable_params > 0
    # warm-up trains (loss moves), sparse phase keeps improving
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_selection_is_deterministic():
    t1, _ = run_training(smt_cfg())
    t2, _ = run_training(smt_cfg())
    assert t1.plan.fingerprint() == t2.plan.fingerprint()


def test_frozen_weights_untouched_in_sparse_phase():
    cfg = smt_cfg()
    trainer, _ = run_training(cfg, n_steps=3)  # just past conversion
    params_before = jax.tree.map(np.asarray, trainer.state["params"])
    for batch in make_batches(3, seed=5):
        trainer.train_step(batch)
    params_after = jax.tree.map(np.asarray, trainer.state["params"])

    plan = trainer.plan
    changed, frozen_equal = 0, 0
    for li, layer in params_before["layers"].items():
        for mod, w_before in layer.items():
            w_after = params_after["layers"][li][mod]
            lp = plan.linears.get(f"{li}.{mod}")
            if lp is None:
                np.testing.assert_array_equal(w_after, w_before)
                frozen_equal += 1
                continue
            mask = np.zeros(w_before.shape, bool)
            for rb, cb in lp.blocks:
                mask[rb * BLOCK:(rb + 1) * BLOCK, cb * BLOCK:(cb + 1) * BLOCK] = True
            np.testing.assert_array_equal(w_after[~mask], w_before[~mask])
            assert not np.array_equal(w_after[mask], w_before[mask])
            changed += 1
    # embeddings / head / norms frozen too
    np.testing.assert_array_equal(params_after["embed_tokens"],
                                  params_before["embed_tokens"])
    assert changed > 0 and frozen_equal > 0


def test_trainable_count_matches_ratio_times_total_blocks():
    from sparse_matrix_tuning_tpu.models.llama import all_2d_param_shapes, init_params as ip
    from sparse_matrix_tuning_tpu.smt.select import count_total_blocks
    cfg = smt_cfg(downsample_attention_blocks_ratio=0.1,
                  downsample_mlp_blocks_ratio=0.1)
    trainer, _ = run_training(cfg, n_steps=3)
    # denominator counts ALL 2-D params (reference fine_tune.py:231-241)
    total_blocks = count_total_blocks(all_2d_param_shapes(
        ip(jax.random.PRNGKey(0), CFG)))
    expected = int(0.1 * total_blocks) + int(0.1 * total_blocks)
    assert trainer.plan.trainable_params == expected * BLOCK * BLOCK


def test_eval_and_export(tmp_path):
    cfg = smt_cfg(output_dir=str(tmp_path), eval_step=0)
    trainer, _ = run_training(cfg, n_steps=4)
    ppl, loss = trainer.evaluate(make_batches(2, seed=9))
    assert np.isfinite(loss) and ppl > 0
    trainer._save("final")
    assert (tmp_path / "final" / "model.safetensors").exists()
    assert (tmp_path / "final" / "smt_plan.json").exists()

    # merged export equals the live dense params
    from sparse_matrix_tuning_tpu.models.hf_io import load_hf_params
    re_params = load_hf_params(str(tmp_path / "final"), CFG, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(re_params["layers"]["0"]["q_proj"]),
        np.asarray(trainer.state["params"]["layers"]["0"]["q_proj"]), rtol=1e-6)


def test_channel_path_e2e():
    cfg = smt_cfg(matrix_sparsity=False, channel_sparsity=True,
                  num_attention_channel=8, num_mlp_channel=8, full_ft_steps=2)
    params = init_params(jax.random.PRNGKey(0), CFG)
    trainer = SMTTrainer(cfg, CFG, params, total_steps=8)
    master_before = jax.tree.map(np.asarray, trainer.state["master"])
    batches = make_batches(6)
    for batch in batches[:2]:
        trainer.train_step(batch)
    # channel warm-up must NOT train (reference fine_tune.py:708)
    master_after = jax.tree.map(np.asarray, trainer.state["master"])
    for a, b in zip(jax.tree.leaves(master_before), jax.tree.leaves(master_after)):
        np.testing.assert_array_equal(a, b)

    losses = [float(trainer.train_step(b)["loss"]) for b in batches[2:]]
    assert trainer.phase == "sparse"
    assert trainer.plan.mode == "channel"
    assert losses[-1] < losses[0]
