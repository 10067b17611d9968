// Native PDB model formatter: a CPython extension replicating
// framedipt_tpu/data/protein.py::to_pdb line-for-line.
//
// Role: trajectory PDB writing is the host-side hot path of the sampling
// pipeline — the reference writes multi-model trajectories through Python
// string formatting (framedipt/analysis/utils.py:128-156), and so did this
// repo's pure-Python writer: a 100-step x 256-residue backbone trajectory
// costs ~1.2 s to serialize, twice the entire 500-step TPU sampling time
// (PERF.md). This module formats all MODEL blocks in one pass with
// snprintf into a preallocated buffer (~20x), with the Python writer kept
// as the behavioural oracle and fallback (tests/unit/test_native_pdb.py
// asserts byte-identical output).
//
// Exposed API: _pdb_native.format_models(
//     pos: buffer f64 [T*N*37*3], t: int, n: int,
//     res3: bytes 3*N (3-letter residue names),
//     resi: buffer i64 [N] (residue indices),
//     chains: bytes N (single-letter chain ids),
//     bfac: buffer f64 [N*37],
//     atom_fields: bytes 4*37 (pre-padded PDB atom-name fields),
//     elem_fields: bytes 2*37 (pre-padded element fields),
//     start_model: int) -> str
// Output is the concatenation of T "MODEL ... ENDMDL" blocks (no END
// record — the Python wrapper appends it), byte-identical to
// "".join(to_pdb(p, model=start_model+k, add_end=False) for k, p ...).
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <clocale>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <locale.h>
#include <string>

namespace {

constexpr int kNumAtoms = 37;
constexpr double kMaskEps = 1e-7;  // analysis/utils.py ATOM_MASK_EPS

// Append printf-formatted text to out (lines are short; 128 is ample for
// any in-range line, and snprintf's return value covers field overflow).
template <typename... Args>
inline void appendf(std::string& out, const char* fmt, Args... args) {
  char buf[160];
  int w = snprintf(buf, sizeof(buf), fmt, args...);
  if (w < 0) return;
  if (w < static_cast<int>(sizeof(buf))) {
    out.append(buf, static_cast<size_t>(w));
  } else {
    // Field overflow (e.g. huge residue index): match Python's widening.
    std::string big(static_cast<size_t>(w) + 1, '\0');
    snprintf(big.data(), big.size(), fmt, args...);
    out.append(big.data(), static_cast<size_t>(w));
  }
}

PyObject* format_models(PyObject*, PyObject* args) {
  Py_buffer pos_buf, resi_buf, bfac_buf;
  const char *res3, *chains, *atom_fields, *elem_fields;
  Py_ssize_t res3_len, chains_len, atom_fields_len, elem_fields_len;
  Py_ssize_t t, n;
  int start_model;
  if (!PyArg_ParseTuple(
          args, "y*nny#y*y#y*y#y#i", &pos_buf, &t, &n, &res3, &res3_len,
          &resi_buf, &chains, &chains_len, &bfac_buf, &atom_fields,
          &atom_fields_len, &elem_fields, &elem_fields_len, &start_model)) {
    return nullptr;
  }
  struct Release {
    Py_buffer *a, *b, *c;
    ~Release() {
      PyBuffer_Release(a);
      PyBuffer_Release(b);
      PyBuffer_Release(c);
    }
  } release{&pos_buf, &resi_buf, &bfac_buf};

  const Py_ssize_t pos_n = t * n * kNumAtoms * 3;
  if (pos_buf.len != pos_n * static_cast<Py_ssize_t>(sizeof(double)) ||
      resi_buf.len != n * static_cast<Py_ssize_t>(sizeof(int64_t)) ||
      bfac_buf.len != n * kNumAtoms * static_cast<Py_ssize_t>(sizeof(double)) ||
      res3_len != 3 * n || chains_len != n ||
      atom_fields_len != 4 * kNumAtoms || elem_fields_len != 2 * kNumAtoms) {
    PyErr_SetString(PyExc_ValueError, "format_models: buffer size mismatch");
    return nullptr;
  }
  const double* pos = static_cast<const double*>(pos_buf.buf);
  const int64_t* resi = static_cast<const int64_t*>(resi_buf.buf);
  const double* bfac = static_cast<const double*>(bfac_buf.buf);

  std::string out;
  out.reserve(static_cast<size_t>(t) *
              (static_cast<size_t>(n) * kNumAtoms * 82 + 64));

  // The loop below only touches borrowed buffers and the std::string, so
  // run it without the GIL (serve.py formats trajectories from
  // ThreadingHTTPServer handler threads). %f is LC_NUMERIC-dependent while
  // Python's float formatting is not — pin the C locale for this thread so
  // a comma-decimal host locale cannot break the byte-identical contract.
  PyThreadState* tstate = PyEval_SaveThread();
  locale_t c_loc = newlocale(LC_NUMERIC_MASK, "C", static_cast<locale_t>(0));
  locale_t old_loc =
      c_loc != static_cast<locale_t>(0) ? uselocale(c_loc)
                                        : static_cast<locale_t>(0);

  for (Py_ssize_t frame = 0; frame < t; ++frame) {
    const double* fpos = pos + frame * n * kNumAtoms * 3;
    appendf(out, "MODEL     %4d\n", start_model + static_cast<int>(frame));
    long atom_index = 1;
    char last_chain = '\0';
    for (Py_ssize_t i = 0; i < n; ++i) {
      const char chain = chains[i];
      if (last_chain != '\0' && chain != last_chain) {
        appendf(out, "TER   %5ld      %.3s %c%4lld\n", atom_index,
                res3 + 3 * (i - 1), last_chain,
                static_cast<long long>(resi[i - 1]));
        ++atom_index;
      }
      last_chain = chain;
      for (int ai = 0; ai < kNumAtoms; ++ai) {
        const double* p = fpos + (i * kNumAtoms + ai) * 3;
        // Same per-frame mask as analysis/utils._as_protein: keep iff
        // sum(|xyz|) > 1e-7. Written as !(sum > eps) so NaN coordinates
        // are DROPPED exactly like Python's `> eps` mask (both compares
        // are false for NaN; `sum <= eps` would invert that and emit
        // "nan" ATOM records).
        if (!(std::fabs(p[0]) + std::fabs(p[1]) + std::fabs(p[2]) >
              kMaskEps)) {
          continue;
        }
        appendf(out,
                "ATOM  %5ld %.4s %.3s %c%4lld    "
                "%8.3f%8.3f%8.3f%6.2f%6.2f          %.2s\n",
                atom_index, atom_fields + 4 * ai, res3 + 3 * i, chain,
                static_cast<long long>(resi[i]), p[0], p[1], p[2], 1.0,
                bfac[i * kNumAtoms + ai], elem_fields + 2 * ai);
        ++atom_index;
      }
    }
    if (n > 0) {
      appendf(out, "TER   %5ld      %.3s %c%4lld\n", atom_index,
              res3 + 3 * (n - 1), last_chain,
              static_cast<long long>(resi[n - 1]));
    }
    out.append("ENDMDL\n");
  }
  if (c_loc != static_cast<locale_t>(0)) {
    uselocale(old_loc);
    freelocale(c_loc);
  }
  PyEval_RestoreThread(tstate);
  return PyUnicode_DecodeASCII(out.data(),
                               static_cast<Py_ssize_t>(out.size()), "strict");
}

PyMethodDef methods[] = {
    {"format_models", format_models, METH_VARARGS,
     "Format atom37 frames as PDB MODEL blocks (see module docstring)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_pdb_native",
    "Native PDB model formatter (oracle: framedipt_tpu.data.protein.to_pdb)",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__pdb_native() { return PyModule_Create(&moduledef); }
