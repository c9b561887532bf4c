"""Native C++ collation vs the numpy reference collator."""
import numpy as np
import pytest

from sparse_matrix_tuning_tpu.data.native import (
    PrefetchLoader, TokenArena, collate_native, native_available,
    native_batch_iterator,
)
from sparse_matrix_tuning_tpu.data.sft import SFTDataset, batch_iterator, collate

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def make_ds(n=20, seed=0):
    rng = np.random.default_rng(seed)
    ids, labels = [], []
    for _ in range(n):
        L = int(rng.integers(3, 40))
        a = rng.integers(1, 1000, L).astype(np.int32)
        b = a.copy()
        b[: L // 2] = -100
        ids.append(a)
        labels.append(b)
    return SFTDataset(ids, labels)


def test_collate_matches_numpy():
    ds = make_ds()
    arena = TokenArena.from_dataset(ds)
    idx = np.array([3, 0, 7, 19], np.int64)
    got = collate_native(arena, idx, pad_id=5, seq_len=48)
    want = collate([ds[int(i)] for i in idx], pad_token_id=5, seq_len=48)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_collate_truncation():
    ds = make_ds()
    arena = TokenArena.from_dataset(ds)
    idx = np.arange(4, dtype=np.int64)
    got = collate_native(arena, idx, pad_id=0, seq_len=8)
    want = collate([ds[int(i)] for i in idx], pad_token_id=0, seq_len=8)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_native_iterator_matches_numpy_iterator():
    ds = make_ds(32)
    arena = TokenArena.from_dataset(ds)
    kw = dict(batch_size=4, pad_token_id=9, buckets=[16, 32, 64],
              seed=3, epoch=1)
    got = list(native_batch_iterator(arena, **kw))
    want = list(batch_iterator(ds, **kw))
    assert len(got) == len(want) == 8
    for g, w in zip(got, want):
        for k in w:
            np.testing.assert_array_equal(g[k], w[k])


def test_bad_index_raises():
    ds = make_ds(4)
    arena = TokenArena.from_dataset(ds)
    with pytest.raises(IndexError):
        collate_native(arena, np.array([99], np.int64), pad_id=0, seq_len=8)


def test_prefetch_loader_order_preserved():
    ds = make_ds(16)
    arena = TokenArena.from_dataset(ds)
    kw = dict(batch_size=4, pad_token_id=0, buckets=[64], seed=0, epoch=0)
    direct = list(native_batch_iterator(arena, **kw))
    loader = PrefetchLoader(lambda: native_batch_iterator(arena, **kw), depth=2)
    fetched = list(loader)
    assert len(fetched) == len(direct)
    for g, w in zip(fetched, direct):
        np.testing.assert_array_equal(g["input_ids"], w["input_ids"])


def test_prefetch_loader_propagates_worker_errors():
    def bad_iter():
        yield {"input_ids": np.zeros((1, 4), np.int32)}
        raise RuntimeError("tokenizer exploded")

    loader = PrefetchLoader(lambda: bad_iter(), depth=2)
    out = []
    with pytest.raises(RuntimeError, match="tokenizer exploded"):
        for b in loader:
            out.append(b)
    assert len(out) == 1  # items before the failure are delivered
