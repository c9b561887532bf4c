// smt_native — C++ host-side data plane for sparse_matrix_tuning_tpu.
//
// The reference rides torch's C++ DataLoader + pin-memory machinery
// (reference deepspeed/fine_tune.py:129-147); this module is the TPU-native
// framework's equivalent: batch collation (right-pad ids / -100-mask labels
// / attention mask) implemented as a GIL-releasing C++ kernel over a
// contiguous token arena, so a Python prefetch thread can overlap batch
// assembly with XLA device execution on single-core hosts.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   fill_batch(ids_arena, labels_arena, offsets, indices,
//              out_ids, out_labels, out_mask, pad_id, ignore_index)
//
// All arrays are passed through the buffer protocol (any contiguous int32
// numpy arrays). Outputs are pre-allocated by the caller and filled here.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct Buf {
    Py_buffer view{};
    bool ok = false;
    ~Buf() { if (ok) PyBuffer_Release(&view); }
    bool acquire(PyObject* obj, int flags) {
        if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
        ok = true;
        return true;
    }
    int32_t* i32() const { return static_cast<int32_t*>(view.buf); }
    const int64_t* i64() const { return static_cast<const int64_t*>(view.buf); }
    Py_ssize_t bytes() const { return view.len; }
};

// fill_batch: for each row r in [0, n_rows):
//   e = indices[r]; tokens = ids_arena[offsets[e] : offsets[e+1]]
//   out_ids[r, :len]  = tokens (truncated to seq_len), rest = pad_id
//   out_labels[r, :]  = labels_arena slice, rest = ignore_index
//   out_mask[r, :len] = 1, rest 0
PyObject* fill_batch(PyObject*, PyObject* args) {
    PyObject *ids_o, *labels_o, *offsets_o, *indices_o, *oi_o, *ol_o, *om_o;
    long pad_id, ignore_index;
    if (!PyArg_ParseTuple(args, "OOOOOOOll", &ids_o, &labels_o, &offsets_o,
                          &indices_o, &oi_o, &ol_o, &om_o, &pad_id,
                          &ignore_index)) {
        return nullptr;
    }

    Buf ids, labels, offsets, indices, out_ids, out_labels, out_mask;
    if (!ids.acquire(ids_o, PyBUF_C_CONTIGUOUS) ||
        !labels.acquire(labels_o, PyBUF_C_CONTIGUOUS) ||
        !offsets.acquire(offsets_o, PyBUF_C_CONTIGUOUS) ||
        !indices.acquire(indices_o, PyBUF_C_CONTIGUOUS) ||
        !out_ids.acquire(oi_o, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) ||
        !out_labels.acquire(ol_o, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) ||
        !out_mask.acquire(om_o, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) {
        return nullptr;
    }

    const Py_ssize_t n_rows = indices.bytes() / (Py_ssize_t)sizeof(int64_t);
    if (n_rows == 0) {
        PyErr_SetString(PyExc_ValueError, "empty indices");
        return nullptr;
    }
    const Py_ssize_t row_bytes = out_ids.bytes() / n_rows;
    const Py_ssize_t seq_len = row_bytes / (Py_ssize_t)sizeof(int32_t);
    if (out_labels.bytes() != out_ids.bytes() || out_mask.bytes() != out_ids.bytes() ||
        seq_len * (Py_ssize_t)sizeof(int32_t) * n_rows != out_ids.bytes()) {
        PyErr_SetString(PyExc_ValueError, "output shape mismatch");
        return nullptr;
    }
    const Py_ssize_t n_offsets = offsets.bytes() / (Py_ssize_t)sizeof(int64_t);
    const Py_ssize_t arena_len = ids.bytes() / (Py_ssize_t)sizeof(int32_t);

    const int64_t* off = offsets.i64();
    const int64_t* idx = indices.i64();
    const int32_t* arena_ids = ids.i32();
    const int32_t* arena_lab = labels.i32();
    int32_t* oi = out_ids.i32();
    int32_t* ol = out_labels.i32();
    int32_t* om = out_mask.i32();

    // validate indices before dropping the GIL
    for (Py_ssize_t r = 0; r < n_rows; ++r) {
        const int64_t e = idx[r];
        if (e < 0 || e + 1 >= n_offsets || off[e] < 0 || off[e + 1] < off[e] ||
            off[e + 1] > arena_len) {
            PyErr_SetString(PyExc_IndexError, "index/offset out of range");
            return nullptr;
        }
    }

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t r = 0; r < n_rows; ++r) {
        const int64_t e = idx[r];
        const int64_t start = off[e];
        const Py_ssize_t len = std::min<Py_ssize_t>(off[e + 1] - start, seq_len);
        int32_t* row_i = oi + r * seq_len;
        int32_t* row_l = ol + r * seq_len;
        int32_t* row_m = om + r * seq_len;
        std::memcpy(row_i, arena_ids + start, len * sizeof(int32_t));
        std::memcpy(row_l, arena_lab + start, len * sizeof(int32_t));
        std::fill(row_i + len, row_i + seq_len, (int32_t)pad_id);
        std::fill(row_l + len, row_l + seq_len, (int32_t)ignore_index);
        std::fill(row_m, row_m + len, 1);
        std::fill(row_m + len, row_m + seq_len, 0);
    }
    Py_END_ALLOW_THREADS

    Py_RETURN_NONE;
}

// max_len(offsets, indices) -> longest example length in the batch
PyObject* max_len(PyObject*, PyObject* args) {
    PyObject *offsets_o, *indices_o;
    if (!PyArg_ParseTuple(args, "OO", &offsets_o, &indices_o)) return nullptr;
    Buf offsets, indices;
    if (!offsets.acquire(offsets_o, PyBUF_C_CONTIGUOUS) ||
        !indices.acquire(indices_o, PyBUF_C_CONTIGUOUS)) {
        return nullptr;
    }
    const Py_ssize_t n_rows = indices.bytes() / (Py_ssize_t)sizeof(int64_t);
    const Py_ssize_t n_offsets = offsets.bytes() / (Py_ssize_t)sizeof(int64_t);
    const int64_t* off = offsets.i64();
    const int64_t* idx = indices.i64();
    int64_t m = 0;
    for (Py_ssize_t r = 0; r < n_rows; ++r) {
        const int64_t e = idx[r];
        if (e < 0 || e + 1 >= n_offsets) {
            PyErr_SetString(PyExc_IndexError, "index out of range");
            return nullptr;
        }
        m = std::max(m, off[e + 1] - off[e]);
    }
    return PyLong_FromLongLong(m);
}

PyMethodDef methods[] = {
    {"fill_batch", fill_batch, METH_VARARGS,
     "Collate a padded batch from token arenas (releases the GIL)."},
    {"max_len", max_len, METH_VARARGS, "Longest example length in a batch."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_smt_native",
    "C++ data-plane kernels for sparse_matrix_tuning_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__smt_native(void) {
    return PyModule_Create(&moduledef);
}
