"""Selection-core unit tests.

Mirrors the reference's ad-hoc __main__ checks (smt_helper.py:307-338:
planted hot channels/blocks must be selected) plus exact-semantics tests of
the four reducers and both strategies, cross-checked against a direct
reimplementation of the reference's torch ops where it matters
(mean-then-abs vs abs-then-mean).
"""
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.smt.select import (
    block_stats, channel_stats, count_total_blocks, num_selected_blocks,
    select_channels, select_submatrices,
)

B = 256


def test_reducers_distinguish_mean_abs_vs_abs_mean():
    g = np.zeros((B, 2 * B), dtype=np.float32)
    # block 0: +1/-1 alternating -> mean ~ 0, abs-mean = 1
    g[:, :B] = 1.0
    g[: B // 2, :B] = -1.0
    # block 1: all 0.5
    g[:, B:] = 0.5
    ma = block_stats(g, "mean_abs")
    am = block_stats(g, "abs_mean")
    assert ma.shape == (1, 2)
    assert ma[0, 0] == pytest.approx(0.0)
    assert am[0, 0] == pytest.approx(1.0)
    assert ma[0, 1] == pytest.approx(0.5)
    assert am[0, 1] == pytest.approx(0.5)


def test_reducers_l1_l2():
    g = np.full((B, B), 2.0, dtype=np.float32)
    assert block_stats(g, "L1")[0, 0] == pytest.approx(2.0 * B * B)
    assert block_stats(g, "L2")[0, 0] == pytest.approx(np.sqrt(4.0 * B * B), rel=1e-6)


def test_global_topn_planted_blocks():
    # Planted pattern like reference smt_helper.py:309-321
    grads = {
        ("gate_proj", 1): np.zeros((4 * B, 2 * B), np.float32),
        ("up_proj", 1): np.zeros((4 * B, 2 * B), np.float32),
        ("down_proj", 2): np.ones((2 * B, 4 * B), np.float32),
    }
    grads[("gate_proj", 1)][0:B, 0:B] = 10.0
    grads[("gate_proj", 1)][B:2 * B, 0:B] = 10.0
    grads[("up_proj", 1)][0:2 * B, 0:B] = 10.0

    stats = {k: block_stats(v, "abs_mean") for k, v in grads.items()}
    sel = select_submatrices(stats, n=4, selection_strategy="no_restriction")
    got = {(k, rc) for k, rcs in sel.items() for rc in rcs}
    assert got == {
        (("gate_proj", 1), (0, 0)), (("gate_proj", 1), (1, 0)),
        (("up_proj", 1), (0, 0)), (("up_proj", 1), (1, 0)),
    }


def test_global_topn_tie_break_matches_reference_heap_order():
    # The reference heap keeps the n largest (value, (key, i, j)) tuples in
    # lexicographic order; on equal values, later module names / larger
    # indices win.
    stats = {
        ("a_proj", 0): np.ones((2, 2), np.float32),
        ("b_proj", 0): np.ones((1, 1), np.float32),
    }
    sel = select_submatrices(stats, n=2, selection_strategy="no_restriction")
    # Ties: ('b_proj',0) > ('a_proj',0); within a_proj (1,1) > (1,0) > ...
    got = {(k, rc) for k, rcs in sel.items() for rc in rcs}
    assert got == {(("b_proj", 0), (0, 0)), (("a_proj", 0), (1, 1))}


def test_norm_dist_per_tensor():
    stats = {
        ("q_proj", 0): np.array([[1.0, 5.0], [3.0, 2.0]], np.float32),
        ("q_proj", 1): np.array([[9.0, 0.0], [0.0, 8.0]], np.float32),
    }
    sel = select_submatrices(stats, n=2, selection_strategy="norm_dist")
    assert sel[("q_proj", 0)] == [(0, 1), (1, 0)]
    assert sel[("q_proj", 1)] == [(0, 0), (1, 1)]


def test_channel_selection_planted():
    # Planted hot channels like reference smt_helper.py:322-338
    act = {
        ("gate_proj", 1): np.zeros((8, 16), np.float32),
        ("down_proj", 2): np.zeros((8, 16), np.float32),
    }
    act[("gate_proj", 1)][:, 3] = 100.0
    act[("down_proj", 2)][:, 5] = 50.0
    stats = {k: channel_stats(v, "mean_abs") for k, v in act.items()}
    sel = select_channels(stats, n=2, selection_strategy="no_restriction")
    assert sel == {("gate_proj", 1): [3], ("down_proj", 2): [5]}


def test_channel_norm_dist():
    stats = {("up_proj", 0): np.array([0.1, 0.9, 0.5], np.float32)}
    sel = select_channels(stats, n=2, selection_strategy="norm_dist")
    assert sel[("up_proj", 0)] == [1, 2]


def test_total_block_denominator_includes_all_2d_params():
    # Quirk from reference fine_tune.py:231-241
    shapes = [(512, 256), (256,), (1024, 512)]
    assert count_total_blocks(shapes) == pytest.approx(2.0 + 8.0)
    assert num_selected_blocks(0.5, 10.0) == 5
    assert num_selected_blocks(-1.0, 10.0) == 0


def test_descending_order_within_tensor():
    s = np.array([[1.0, 3.0], [2.0, 0.5]], np.float32)
    sel = select_submatrices({("q_proj", 0): s}, n=3)
    assert sel[("q_proj", 0)] == [(0, 1), (1, 0), (0, 0)]


def test_block_stats_step_mean_abs_commutes_with_step_sum():
    """per_step_stats exactness (round 4): accumulating the SIGNED block
    mean per step and finalizing with abs reproduces block_stats of the
    summed grads exactly — including under cancellation, where the old
    sum-of-|mean| form diverges."""
    from sparse_matrix_tuning_tpu.smt.select import (
        block_stats_final, block_stats_step)

    rng = np.random.default_rng(0)
    # strong cancellation across steps: g2 ~ -g1 + noise
    g1 = rng.standard_normal((2 * B, B)).astype(np.float32)
    g2 = (-g1 + 0.01 * rng.standard_normal(g1.shape)).astype(np.float32)

    acc = block_stats_step(g1, "mean_abs") + block_stats_step(g2, "mean_abs")
    exact = block_stats(g1 + g2, "mean_abs")
    np.testing.assert_allclose(block_stats_final(acc, "mean_abs"), exact,
                               rtol=1e-5, atol=1e-9)

    # the abs-inside accumulation (what the old code did) is NOT exact here
    old = block_stats(g1, "mean_abs") + block_stats(g2, "mean_abs")
    assert not np.allclose(old, exact, rtol=0.2)

    # non-commuting reducers pass through unchanged (stat == step form,
    # final is identity)
    for strat in ("abs_mean", "L1", "L2"):
        np.testing.assert_array_equal(block_stats_step(g1, strat),
                                      block_stats(g1, strat))
        s = block_stats(g1, strat)
        np.testing.assert_array_equal(block_stats_final(s, strat), s)
