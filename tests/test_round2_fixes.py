"""Round-2 fix coverage: warm-up q/k LR boost, auto saliency accumulation,
vectorized selection equivalence, multi-host eval gather, prefetch-loader
early abandon, weight-decay grouping parity."""
import threading
import time

import jax
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.models.llama import init_params
from sparse_matrix_tuning_tpu.train.steps import (
    build_warmup_step, init_warmup_state,
)
from sparse_matrix_tuning_tpu.smt.optimizer import make_lr_schedule

from test_train_e2e import CFG, make_batches, smt_cfg


# ---------------------------------------------------------------------------
# Warm-up q/k LR boost (reference fine_tune.py:160-163 builds the boosted
# groups for the WARM-UP optimizer too)
# ---------------------------------------------------------------------------

def _one_warmup_delta(qk_scheduler: bool):
    cfg = smt_cfg(qk_scheduler=qk_scheduler, qk_lr_times=4)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_warmup_state(params, cfg)
    sched = make_lr_schedule("constant", cfg.ft_learning_rate, 0, 10)
    step = jax.jit(build_warmup_step(cfg, CFG, sched))
    batch = make_batches(1)[0]
    before = jax.tree.map(np.asarray, state["master"])
    state, _ = step(state, batch)
    after = jax.tree.map(np.asarray, state["master"])
    return before, after


def test_warmup_qk_lr_boost():
    b0, a0 = _one_warmup_delta(qk_scheduler=False)
    b1, a1 = _one_warmup_delta(qk_scheduler=True)
    dq_base = a0["layers"]["0"]["q_proj"] - b0["layers"]["0"]["q_proj"]
    dq_boost = a1["layers"]["0"]["q_proj"] - b1["layers"]["0"]["q_proj"]
    # first Adam step: update = k_lr * mhat/(sqrt(vhat)+eps), identical m/v
    # in both runs -> the q_proj delta scales exactly by qk_lr_times
    np.testing.assert_allclose(dq_boost, 4.0 * dq_base, rtol=1e-5, atol=1e-8)
    # non-q/k modules are unaffected by the flag
    dg_base = a0["layers"]["0"]["gate_proj"] - b0["layers"]["0"]["gate_proj"]
    dg_boost = a1["layers"]["0"]["gate_proj"] - b1["layers"]["0"]["gate_proj"]
    np.testing.assert_allclose(dg_boost, dg_base, rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# saliency_accumulation="auto"
# ---------------------------------------------------------------------------

def test_saliency_auto_small_model_uses_grad_sum():
    cfg = smt_cfg(saliency_accumulation="auto")
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_warmup_state(params, cfg)
    assert cfg.saliency_accumulation == "grad_sum"  # resolved in place
    assert state["acc"]["0.gate_proj"].shape == (512, 256)


def test_saliency_auto_switches_at_scale():
    from sparse_matrix_tuning_tpu.train.steps import (
        _grad_sum_accumulator_bytes, resolve_saliency_accumulation)
    from sparse_matrix_tuning_tpu.models.llama import LlamaConfig
    # 8B-class shapes as ShapeDtypeStructs (no allocation)
    big = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      max_position_embeddings=2048)
    layers = {}
    for li in range(big.num_hidden_layers):
        kv = big.hidden_size // (big.num_attention_heads // big.num_key_value_heads)
        layers[str(li)] = {
            "q_proj": jax.ShapeDtypeStruct((4096, 4096), np.float32),
            "k_proj": jax.ShapeDtypeStruct((kv, 4096), np.float32),
            "v_proj": jax.ShapeDtypeStruct((kv, 4096), np.float32),
            "gate_proj": jax.ShapeDtypeStruct((14336, 4096), np.float32),
            "up_proj": jax.ShapeDtypeStruct((14336, 4096), np.float32),
            "down_proj": jax.ShapeDtypeStruct((4096, 14336), np.float32),
        }
    master = {"layers": layers}
    cfg = smt_cfg(saliency_accumulation="auto", max_seq_len=2048)
    # matrix path at 8B: > 2 GiB of fp32 grad accumulators
    assert _grad_sum_accumulator_bytes(master, cfg) > 2 * 1024 ** 3
    assert resolve_saliency_accumulation(cfg, master) == "per_step_stats"

    chan = smt_cfg(saliency_accumulation="auto", matrix_sparsity=False,
                   channel_sparsity=True, max_seq_len=2048)
    assert resolve_saliency_accumulation(chan, master) == "per_step_stats"


# ---------------------------------------------------------------------------
# Vectorized global top-n == reference heap order (brute-force oracle)
# ---------------------------------------------------------------------------

def _oracle_select(stats, n):
    candidates = []
    for key, s in stats.items():
        nr, nc = s.shape
        for i in range(nr):
            for j in range(nc):
                candidates.append((float(s[i, j]), key, i, j))
    candidates.sort(key=lambda t: (t[0], t[1], t[2], t[3]), reverse=True)
    out = {}
    for _, key, i, j in candidates[:n]:
        out.setdefault(key, []).append((i, j))
    return out


def test_vectorized_topn_matches_bruteforce_with_ties():
    from sparse_matrix_tuning_tpu.smt.select import select_submatrices
    rng = np.random.default_rng(0)
    for trial in range(10):
        stats = {}
        for k in range(4):
            shape = (int(rng.integers(1, 6)), int(rng.integers(1, 6)))
            # quantized values force plenty of exact ties
            stats[(f"m{k}_proj", int(rng.integers(0, 3)))] = (
                rng.integers(0, 4, shape).astype(np.float32) * 0.5)
        n = int(rng.integers(1, 12))
        got = select_submatrices(stats, n)
        want = _oracle_select(stats, n)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_vectorized_topn_scale():
    """70B-scale synthetic stats select in seconds, not minutes."""
    from sparse_matrix_tuning_tpu.smt.select import select_submatrices
    rng = np.random.default_rng(1)
    stats = {}
    for li in range(80):
        for mod, shape in (("q_proj", (32, 32)), ("gate_proj", (112, 32)),
                           ("down_proj", (32, 112))):
            stats[(mod, li)] = rng.random(shape).astype(np.float32)
    t0 = time.perf_counter()
    sel = select_submatrices(stats, n=5000)
    assert sum(len(v) for v in sel.values()) == 5000
    assert time.perf_counter() - t0 < 10.0


# ---------------------------------------------------------------------------
# Multi-host generation-eval gather (reference gather_object,
# run_commonsense_parallel.py:281-294)
# ---------------------------------------------------------------------------

def test_gather_row_roundtrip():
    from sparse_matrix_tuning_tpu.eval import harness
    outs = ["true.", "The answer is answer3 é中文", "", "false"]
    buf0 = harness._encode_rows(4, [0, 2], [outs[0], outs[2]])
    buf1 = harness._encode_rows(4, [1, 3], [outs[1], outs[3]])
    merged = np.maximum(buf0, buf1)  # what _allgather_merge does across hosts
    assert harness._decode_rows(merged) == outs


def test_run_dataset_eval_multihost_strided(monkeypatch):
    from sparse_matrix_tuning_tpu.eval import harness

    examples = [
        {"instruction": f"q{i}", "answer": "true" if i % 2 == 0 else "false"}
        for i in range(6)
    ]
    answers = {f"q{i}": ("true" if i % 2 == 0 else "false") for i in range(6)}

    def generate_for(prompts):
        # echo the right answer for whatever subset this "process" received
        return [next(a for q, a in answers.items() if q in p) for p in prompts]

    # process 1's contribution, precomputed with the same strided split
    other_idx = list(range(1, 6, 2))
    other_buf = harness._encode_rows(
        6, other_idx, generate_for([harness.build_prompts(examples)[i]
                                    for i in other_idx]))

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(harness, "_allgather_max", lambda m: m)
    monkeypatch.setattr(harness, "_allgather_merge",
                        lambda buf: np.maximum(buf, other_buf))

    res = harness.run_dataset_eval("boolq", examples, generate_for)
    assert res["accuracy"] == 1.0
    assert res["n"] == 6


# ---------------------------------------------------------------------------
# PrefetchLoader early abandon must not leak the worker thread
# ---------------------------------------------------------------------------

def test_prefetch_loader_early_abandon():
    from sparse_matrix_tuning_tpu.data.native import PrefetchLoader

    def factory():
        i = 0
        while True:  # infinite producer
            yield {"i": np.full((4,), i)}
            i += 1

    n_before = threading.active_count()
    loader = PrefetchLoader(factory, depth=2)
    gen = iter(loader)
    assert next(gen)["i"][0] == 0
    assert next(gen)["i"][0] == 1
    gen.close()  # consumer abandons mid-iteration (fit's break / exception)
    loader._thread.join(timeout=5)
    assert not loader._thread.is_alive()
    assert threading.active_count() <= n_before + 1


def test_prefetch_loader_full_iteration_and_error():
    from sparse_matrix_tuning_tpu.data.native import PrefetchLoader

    items = [{"i": np.full((2,), k)} for k in range(5)]
    loader = PrefetchLoader(lambda: iter(items), depth=2)
    got = [b["i"][0] for b in loader]
    assert got == [0, 1, 2, 3, 4]

    def bad():
        yield items[0]
        raise RuntimeError("boom")

    loader = PrefetchLoader(bad, depth=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


# ---------------------------------------------------------------------------
# Weight-decay grouping parity: embeddings DO decay (ADVICE r1)
# ---------------------------------------------------------------------------

def test_wd_mask_decays_embeddings_not_norms():
    from sparse_matrix_tuning_tpu.smt.optimizer import full_ft_wd_mask
    assert full_ft_wd_mask("embed_tokens")
    assert full_ft_wd_mask("layers/0/q_proj")
    assert not full_ft_wd_mask("layers/0/input_layernorm")
    assert not full_ft_wd_mask("norm")
    assert not full_ft_wd_mask("layers/1/o_proj/bias")
