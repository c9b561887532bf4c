"""Native (C++) data plane: arena-backed collation + background prefetch.

Builds csrc/smt_native.cpp on first use (g++ is in the image; pybind11 is
not, so the extension uses the raw CPython C API). Falls back to the numpy
collator in data/sft.py when no toolchain is available.

Why it exists: the reference leans on torch's C++ DataLoader workers
(fine_tune.py:129-147); this image's hosts have few cores, so batch
assembly must overlap device execution. fill_batch releases the GIL, and
PrefetchLoader runs it in a thread while XLA owns the device.
"""

from __future__ import annotations

import os
import queue
import subprocess
import sys
import sysconfig
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_NATIVE = None
_TRIED = False


def _build_and_import():
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    src = os.path.join(repo, "csrc", "smt_native.cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, f"_smt_native{ext_suffix}")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            include = sysconfig.get_paths()["include"]
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   f"-I{include}", src, "-o", out]
            subprocess.run(cmd, check=True, capture_output=True)
        sys.path.insert(0, here)
        import _smt_native  # noqa: F401
        _NATIVE = _smt_native
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        print(f"[smt-native] falling back to numpy collation ({e})")
        _NATIVE = None
    return _NATIVE


def native_available() -> bool:
    return _build_and_import() is not None


class TokenArena:
    """Dataset examples flattened into contiguous int32 arenas + offsets —
    the layout fill_batch consumes (and a much smaller resident footprint
    than a list of tiny numpy arrays)."""

    def __init__(self, input_ids: Sequence[np.ndarray], labels: Sequence[np.ndarray]):
        lens = np.fromiter((len(x) for x in input_ids), np.int64, len(input_ids))
        self.offsets = np.zeros(len(input_ids) + 1, np.int64)
        np.cumsum(lens, out=self.offsets[1:])
        total = int(self.offsets[-1])
        self.ids = np.empty(total, np.int32)
        self.labels = np.empty(total, np.int32)
        for i, (a, b) in enumerate(zip(input_ids, labels)):
            s, e = self.offsets[i], self.offsets[i + 1]
            self.ids[s:e] = a
            self.labels[s:e] = b

    def __len__(self):
        return len(self.offsets) - 1

    @classmethod
    def from_dataset(cls, ds) -> "TokenArena":
        return cls(ds.input_ids, ds.labels)


def collate_native(arena: TokenArena, indices: np.ndarray, pad_id: int,
                   seq_len: int, ignore_index: int = -100) -> Dict[str, np.ndarray]:
    mod = _build_and_import()
    n = len(indices)
    out_ids = np.empty((n, seq_len), np.int32)
    out_labels = np.empty((n, seq_len), np.int32)
    out_mask = np.empty((n, seq_len), np.int32)
    mod.fill_batch(arena.ids, arena.labels, arena.offsets,
                   np.ascontiguousarray(indices, np.int64),
                   out_ids, out_labels, out_mask, pad_id, ignore_index)
    return {"input_ids": out_ids, "labels": out_labels, "attention_mask": out_mask}


def native_batch_iterator(arena: TokenArena, batch_size: int, pad_token_id: int,
                          buckets: Sequence[int], seed: int, epoch: int,
                          shuffle: bool = True, drop_last: bool = True
                          ) -> Iterator[Dict[str, np.ndarray]]:
    """Arena-backed equivalent of data.sft.batch_iterator."""
    mod = _build_and_import()
    order = np.arange(len(arena), dtype=np.int64)
    if shuffle:
        order = np.random.default_rng(hash((seed, epoch)) % (2 ** 31)).permutation(order)
    n_full = len(order) // batch_size if drop_last else -(-len(order) // batch_size)
    sorted_buckets = sorted(buckets)
    for bi in range(n_full):
        idx = order[bi * batch_size:(bi + 1) * batch_size]
        if len(idx) < batch_size:
            idx = np.concatenate([idx, order[: batch_size - len(idx)]])
        longest = int(mod.max_len(arena.offsets, np.ascontiguousarray(idx)))
        seq_len = next((b for b in sorted_buckets if longest <= b), sorted_buckets[-1])
        yield collate_native(arena, idx, pad_token_id, seq_len)


class PrefetchLoader:
    """Background-thread prefetcher: assembles the next batches while the
    device runs the current step (fill_batch drops the GIL; jitted execution
    drops it too, so a single-core host still overlaps)."""

    _DONE = object()

    def __init__(self, iterator_factory, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._factory = iterator_factory
        self._thread: Optional[threading.Thread] = None

    def __iter__(self):
        it = self._factory()
        error: list = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not put(item):
                        return  # consumer gone; don't leak the thread
            except BaseException as e:  # propagate to the consumer
                error.append(e)
            finally:
                put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        try:
            while True:
                item = self._q.get()
                if item is self._DONE:
                    break
                yield item
        finally:
            # normal exit, early break, or exception: release a blocked put
            stop.set()
            while True:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    break
            self._thread.join()
        if error:
            raise error[0]
