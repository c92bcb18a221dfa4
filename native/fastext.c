/* CPython extension for batch line materialization.
 *
 * The Reader's extraction pipeline resolves hits to deduplicated line ids
 * with vectorized numpy (ops/extract.py); what remains — decoding each
 * distinct line to str and fanning the objects out into per-query lists —
 * is object-creation work the interpreter does at ~0.3 M lines/s in a
 * comprehension.  This module does the same at C speed (PyUnicode decode +
 * borrowed-reference fan-out), the role PyO3's Vec<&str> -> list conversion
 * plays in the reference (src/lib.rs:275, 284-287).
 *
 * materialize(data, starts, ends, inv, gstart, gstop, qid) -> dict
 *   data:   buffer, the chunk text
 *   starts: int64[D] line start offsets   (distinct lines)
 *   ends:   int64[D] line end offsets (exclusive)
 *   inv:    int64[T] entry -> distinct-line index, grouped by query
 *   gstart: int64[G] group start in inv   gstop: int64[G] group end
 *   qid:    int64[G] query id per group
 * Returns {qid: [str, ...]} with lines decoded utf-8/surrogateescape
 * (lossless for arbitrary bytes — the analogue of the reference's
 * from_utf8_unchecked).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>

static PyObject* materialize(PyObject* self, PyObject* args) {
  Py_buffer data, bstarts, bends, binv, bgstart, bgstop, bqid;
  if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*y*", &data, &bstarts, &bends,
                        &binv, &bgstart, &bgstop, &bqid))
    return NULL;
  PyObject* out = NULL;
  PyObject** dist = NULL;
  const char* base = (const char*)data.buf;
  const int64_t* starts = (const int64_t*)bstarts.buf;
  const int64_t* ends = (const int64_t*)bends.buf;
  const int64_t* inv = (const int64_t*)binv.buf;
  const int64_t* gstart = (const int64_t*)bgstart.buf;
  const int64_t* gstop = (const int64_t*)bgstop.buf;
  const int64_t* qid = (const int64_t*)bqid.buf;
  Py_ssize_t D = bstarts.len / 8;
  Py_ssize_t T = binv.len / 8;
  Py_ssize_t G = bgstart.len / 8;
  Py_ssize_t d = 0;
  if (bends.len / 8 != D || bgstop.len / 8 != G || bqid.len / 8 != G) {
    PyErr_SetString(PyExc_ValueError, "materialize: length mismatch");
    goto done;
  }
  dist = (PyObject**)PyMem_Malloc((size_t)(D > 0 ? D : 1) * sizeof(void*));
  if (dist == NULL) {
    PyErr_NoMemory();
    goto done;
  }
  for (d = 0; d < D; ++d) {
    int64_t s = starts[d], e = ends[d];
    if (s < 0 || e < s || e > (int64_t)data.len) {
      PyErr_SetString(PyExc_ValueError, "materialize: span out of bounds");
      goto done;
    }
    dist[d] = PyUnicode_DecodeUTF8(base + s, (Py_ssize_t)(e - s),
                                   "surrogateescape");
    if (dist[d] == NULL) goto done;
  }
  out = PyDict_New();
  if (out == NULL) goto done;
  for (Py_ssize_t g = 0; g < G; ++g) {
    int64_t a = gstart[g], b = gstop[g];
    if (a < 0 || b < a || b > (int64_t)T) {
      PyErr_SetString(PyExc_ValueError, "materialize: group out of bounds");
      Py_CLEAR(out);
      goto done;
    }
    PyObject* lst = PyList_New((Py_ssize_t)(b - a));
    if (lst == NULL) {
      Py_CLEAR(out);
      goto done;
    }
    for (int64_t t = a; t < b; ++t) {
      int64_t ix = inv[t];
      if (ix < 0 || ix >= (int64_t)D) {
        PyErr_SetString(PyExc_ValueError, "materialize: inv out of bounds");
        Py_DECREF(lst);
        Py_CLEAR(out);
        goto done;
      }
      PyObject* s = dist[ix];
      Py_INCREF(s);
      PyList_SET_ITEM(lst, (Py_ssize_t)(t - a), s);
    }
    PyObject* key = PyLong_FromLongLong(qid[g]);
    int rc = key == NULL ? -1 : PyDict_SetItem(out, key, lst);
    Py_XDECREF(key);
    Py_DECREF(lst);
    if (rc != 0) {
      Py_CLEAR(out);
      goto done;
    }
  }
done:
  if (dist != NULL) {
    for (Py_ssize_t i = 0; i < d; ++i) Py_XDECREF(dist[i]);
    PyMem_Free(dist);
  }
  PyBuffer_Release(&data);
  PyBuffer_Release(&bstarts);
  PyBuffer_Release(&bends);
  PyBuffer_Release(&binv);
  PyBuffer_Release(&bgstart);
  PyBuffer_Release(&bgstop);
  PyBuffer_Release(&bqid);
  return out;
}

static PyMethodDef methods[] = {
    {"materialize", materialize, METH_VARARGS,
     "Decode distinct line spans and fan them out into per-query lists."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastext",
    "Native batch line materialization for pysubstringsearch_tpu.", -1,
    methods,
};

PyMODINIT_FUNC PyInit__fastext(void) { return PyModule_Create(&moduledef); }
