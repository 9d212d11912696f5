/* fastio — native data-plane helpers for longterm360fov_tpu.
 *
 * The reference's data prep is Python-loop bound (per-line float
 * parsing, per-window copies). This CPython extension implements the
 * two host-side hot paths natively (SURVEY.md §3.1 "host, IO-bound"):
 *
 *   parse_trace(bytes, n_cols) -> float32 ndarray (rows, n_cols)
 *       Delimiter-agnostic numeric log parser (commas/whitespace,
 *       '#' comments, non-numeric header rows skipped) — one pass,
 *       no per-line Python objects.
 *
 *   window_copy(trace, h_in, h_out, stride) -> (past, future)
 *       Packed sliding-window materialization: (N, h_in, D) past and
 *       (N, h_out, D) future float32 arrays in one memcpy sweep —
 *       replaces numpy's stride-trick view + 2x ascontiguousarray
 *       passes.
 *
 * Built with setuptools (native/setup.py); loaded via
 * longterm360fov_tpu.native with a pure-numpy fallback so the package
 * works before compilation. No pybind11 in this environment — plain
 * CPython C API + numpy C API.
 */
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>
#include <stdlib.h>
#include <string.h>

/* ---- parse_trace ------------------------------------------------------- */

static int is_sep(char c) { return c == ',' || c == ' ' || c == '\t' || c == '\r'; }

static PyObject *parse_trace(PyObject *self, PyObject *args) {
  Py_buffer buf;
  Py_ssize_t want_cols = 0; /* 0 = infer from first numeric row */
  if (!PyArg_ParseTuple(args, "y*|n", &buf, &want_cols)) return NULL;

  if (want_cols > 64 || want_cols < 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError,
                    "n_cols must be in [0, 64] (0 = infer)");
    return NULL;
  }

  const char *p = (const char *)buf.buf;
  const char *end = p + buf.len;

  size_t cap = 1024, n_vals = 0;
  double *vals = (double *)malloc(cap * sizeof(double));
  Py_ssize_t n_cols = want_cols, n_rows = 0;
  if (!vals) { PyBuffer_Release(&buf); return PyErr_NoMemory(); }

  /* strtod needs NUL-terminated input, but the Py_buffer (bytearray /
   * memoryview / mmap accepted by y*) is not guaranteed to be — copy each
   * line into a growing NUL-terminated scratch before tokenizing. */
  size_t scratch_cap = 256;
  char *scratch = (char *)malloc(scratch_cap);
  if (!scratch) { free(vals); PyBuffer_Release(&buf); return PyErr_NoMemory(); }

  double row[64];
  while (p < end) {
    /* one line */
    const char *eol = memchr(p, '\n', (size_t)(end - p));
    if (!eol) eol = end;
    /* skip comments / blank */
    const char *s = p;
    while (s < eol && is_sep(*s)) s++;
    if (s >= eol || *s == '#') { p = eol + 1; continue; }

    size_t line_len = (size_t)(eol - s);
    if (line_len + 1 > scratch_cap) {
      while (line_len + 1 > scratch_cap) scratch_cap *= 2;
      char *ns = (char *)realloc(scratch, scratch_cap);
      if (!ns) {
        free(scratch); free(vals); PyBuffer_Release(&buf);
        return PyErr_NoMemory();
      }
      scratch = ns;
    }
    memcpy(scratch, s, line_len);
    scratch[line_len] = '\0';

    const char *q = scratch, *qend = scratch + line_len;
    Py_ssize_t c = 0; /* total numeric tokens on the line */
    int bad = 0;
    while (q < qend) {
      char *next;
      double v = strtod(q, &next);
      if (next == q) { bad = 1; break; } /* non-numeric token → drop row */
      if (c < 64) row[c] = v;            /* store first 64, validate all */
      c++;
      q = next;
      while (q < qend && is_sep(*q)) q++;
    }
    if (!bad && n_cols == 0 && c > 64) {
      /* column count must be inferred from this row but it exceeds the
       * row buffer: make the cap explicit instead of silently truncating */
      free(scratch); free(vals); PyBuffer_Release(&buf);
      PyErr_SetString(PyExc_ValueError,
                      "row has more than 64 numeric columns; pass n_cols");
      return NULL;
    }
    if (!bad && c > 0) {
      if (n_cols == 0) n_cols = c;
      if (c >= n_cols) { /* truncate extra columns */
        if (n_vals + (size_t)n_cols > cap) {
          while (n_vals + (size_t)n_cols > cap) cap *= 2;
          double *nv = (double *)realloc(vals, cap * sizeof(double));
          if (!nv) {
            free(scratch); free(vals); PyBuffer_Release(&buf);
            return PyErr_NoMemory();
          }
          vals = nv;
        }
        memcpy(vals + n_vals, row, (size_t)n_cols * sizeof(double));
        n_vals += (size_t)n_cols;
        n_rows++;
      }
    }
    p = eol + 1;
  }
  free(scratch);
  PyBuffer_Release(&buf);

  npy_intp dims[2] = {n_rows, n_cols ? n_cols : 0};
  PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) { free(vals); return NULL; }
  float *out = (float *)PyArray_DATA((PyArrayObject *)arr);
  for (Py_ssize_t i = 0; i < n_rows * n_cols; i++) out[i] = (float)vals[i];
  free(vals);
  return arr;
}

/* ---- window_copy ------------------------------------------------------- */

static PyObject *window_copy(PyObject *self, PyObject *args) {
  PyObject *in_obj;
  Py_ssize_t h_in, h_out, stride = 1;
  if (!PyArg_ParseTuple(args, "Onn|n", &in_obj, &h_in, &h_out, &stride))
    return NULL;
  if (stride < 1 || h_in < 1 || h_out < 1) {
    PyErr_SetString(PyExc_ValueError, "h_in, h_out, stride must be >= 1");
    return NULL;
  }
  PyArrayObject *tr = (PyArrayObject *)PyArray_FROM_OTF(
      in_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!tr) return NULL;
  if (PyArray_NDIM(tr) != 2) {
    Py_DECREF(tr);
    PyErr_SetString(PyExc_ValueError, "trace must be (T, D)");
    return NULL;
  }
  Py_ssize_t t = PyArray_DIM(tr, 0), d = PyArray_DIM(tr, 1);
  Py_ssize_t span = h_in + h_out;
  if (t < span) {
    Py_DECREF(tr);
    PyErr_Format(PyExc_ValueError, "trace length %zd < window span %zd", t, span);
    return NULL;
  }
  Py_ssize_t n = (t - span) / stride + 1;
  npy_intp pd[3] = {n, h_in, d}, fd[3] = {n, h_out, d};
  PyObject *past = PyArray_SimpleNew(3, pd, NPY_FLOAT32);
  PyObject *future = PyArray_SimpleNew(3, fd, NPY_FLOAT32);
  if (!past || !future) {
    Py_XDECREF(past); Py_XDECREF(future); Py_DECREF(tr);
    return NULL;
  }
  const float *src = (const float *)PyArray_DATA(tr);
  float *pp = (float *)PyArray_DATA((PyArrayObject *)past);
  float *ff = (float *)PyArray_DATA((PyArrayObject *)future);
  size_t row_in = (size_t)(h_in * d), row_out = (size_t)(h_out * d);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; i++) {
    const float *base = src + (size_t)(i * stride) * (size_t)d;
    memcpy(pp + (size_t)i * row_in, base, row_in * sizeof(float));
    memcpy(ff + (size_t)i * row_out, base + row_in, row_out * sizeof(float));
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(tr);
  return Py_BuildValue("(NN)", past, future);
}

/* window_fill(trace, past_or_None, future, h_in, stride=1)
 *
 * Like window_copy but writes into PREALLOCATED C-contiguous float32
 * outputs — the single-copy packed-dataset path (data.windows_from_store
 * fills slices of the final arrays directly; no intermediates, no
 * concatenate). With past=None only the futures are filled, offset by
 * h_in — the peer-future path, which needs no past windows. */
static PyObject *window_fill(PyObject *self, PyObject *args) {
  PyObject *in_obj, *past_obj, *future_obj;
  Py_ssize_t h_in, stride = 1;
  if (!PyArg_ParseTuple(args, "OOOn|n", &in_obj, &past_obj, &future_obj,
                        &h_in, &stride))
    return NULL;
  if (stride < 1 || h_in < 1) {
    PyErr_SetString(PyExc_ValueError, "h_in and stride must be >= 1");
    return NULL;
  }
  PyArrayObject *tr = (PyArrayObject *)PyArray_FROM_OTF(
      in_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!tr) return NULL;
  PyArrayObject *past = NULL;
  if (past_obj != Py_None) {
    if (!PyArray_Check(past_obj)) {
      Py_DECREF(tr);
      PyErr_SetString(PyExc_TypeError, "past must be an ndarray or None");
      return NULL;
    }
    past = (PyArrayObject *)past_obj;
  }
  if (!PyArray_Check(future_obj)) {
    Py_DECREF(tr);
    PyErr_SetString(PyExc_TypeError, "future must be an ndarray");
    return NULL;
  }
  PyArrayObject *future = (PyArrayObject *)future_obj;
  /* validate outputs: 3-D float32 C-contiguous writable (N, h, D) */
  PyArrayObject *outs[2] = {past, future};
  for (int j = 0; j < 2; j++) {
    PyArrayObject *o = outs[j];
    if (!o) continue;
    if (PyArray_TYPE(o) != NPY_FLOAT32 || PyArray_NDIM(o) != 3 ||
        !PyArray_IS_C_CONTIGUOUS(o) || !PyArray_ISWRITEABLE(o)) {
      Py_DECREF(tr);
      PyErr_SetString(PyExc_ValueError,
                      "outputs must be writable C-contiguous float32 (N,h,D)");
      return NULL;
    }
  }
  if (PyArray_NDIM(tr) != 2) {
    Py_DECREF(tr);
    PyErr_SetString(PyExc_ValueError, "trace must be (T, D)");
    return NULL;
  }
  Py_ssize_t t = PyArray_DIM(tr, 0), d = PyArray_DIM(tr, 1);
  Py_ssize_t n = PyArray_DIM(future, 0), h_out = PyArray_DIM(future, 1);
  if (PyArray_DIM(future, 2) != d ||
      (past && (PyArray_DIM(past, 0) != n || PyArray_DIM(past, 1) != h_in ||
                PyArray_DIM(past, 2) != d))) {
    Py_DECREF(tr);
    PyErr_SetString(PyExc_ValueError, "shape mismatch between trace/outputs");
    return NULL;
  }
  if (n > 0 && (n - 1) * stride + h_in + h_out > t) {
    Py_DECREF(tr);
    PyErr_Format(PyExc_ValueError,
                 "trace length %zd too short for %zd windows", t, n);
    return NULL;
  }
  const float *src = (const float *)PyArray_DATA(tr);
  float *pp = past ? (float *)PyArray_DATA(past) : NULL;
  float *ff = (float *)PyArray_DATA(future);
  size_t row_in = (size_t)(h_in * d), row_out = (size_t)(h_out * d);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; i++) {
    const float *base = src + (size_t)(i * stride) * (size_t)d;
    if (pp) memcpy(pp + (size_t)i * row_in, base, row_in * sizeof(float));
    memcpy(ff + (size_t)i * row_out, base + row_in, row_out * sizeof(float));
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(tr);
  Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"parse_trace", parse_trace, METH_VARARGS,
     "parse_trace(data: bytes, n_cols: int = 0) -> float32 (rows, cols)"},
    {"window_copy", window_copy, METH_VARARGS,
     "window_copy(trace (T,D) f32, h_in, h_out, stride=1) -> (past, future)"},
    {"window_fill", window_fill, METH_VARARGS,
     "window_fill(trace (T,D) f32, past (N,h_in,D)|None, future (N,h_out,D), "
     "h_in, stride=1) -> None (fills outputs in place)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef mod = {PyModuleDef_HEAD_INIT, "_fastio",
                                 "native data-plane helpers", -1, methods};

PyMODINIT_FUNC PyInit__fastio(void) {
  import_array();
  return PyModule_Create(&mod);
}
