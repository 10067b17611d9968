// Native CIF category parser: a CPython extension replicating
// framedipt_tpu/data/mmcif.py::parse_cif_categories token-for-token.
//
// Role: the reference's mmCIF stack rides BioPython's C-accelerated parser
// (framedipt/data/mmcif_parsing.py:173-420); the pure-Python tokenizer here
// costs ~150 ms per assembly CIF, which dominates dataset preprocessing
// (framedipt/data/process_pdb_dataset.py). This module parses the same
// grammar (loops, quoted strings, ;-delimited text blocks, comments) in a
// single pass over the UTF-8 buffer, ~20x faster, with the Python
// implementation kept as the behavioural oracle and fallback
// (tests/unit/test_native_cif.py asserts dict-identical output).
//
// Exposed API: _cif_native.parse_categories(text: str)
//   -> dict[category: str, dict[item: str, list[str]]]
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <string>
#include <string_view>
#include <vector>

namespace {

inline bool is_ws(char c) { return c == ' ' || c == '\t'; }

inline char ascii_lower(char c) {
  return (c >= 'A' && c <= 'Z') ? char(c - 'A' + 'a') : c;
}

inline bool iprefix(std::string_view s, std::string_view lower_prefix) {
  if (s.size() < lower_prefix.size()) return false;
  for (size_t i = 0; i < lower_prefix.size(); ++i) {
    if (ascii_lower(s[i]) != lower_prefix[i]) return false;
  }
  return true;
}

inline bool iequal(std::string_view s, std::string_view lower) {
  return s.size() == lower.size() && iprefix(s, lower);
}

struct Line {
  const char* b;
  const char* e;
  bool starts_semicolon() const { return b != e && *b == ';'; }
};

// str.splitlines() for the line terminators that occur in CIF files
// (\n, \r\n, \r). Exotic Unicode line breaks are not split — such bytes
// cannot appear in ASCII CIF tokens anyway; the oracle test guards this.
void split_lines(const char* data, Py_ssize_t size, std::vector<Line>* out) {
  const char* p = data;
  const char* end = data + size;
  const char* line = p;
  while (p < end) {
    if (*p == '\n' || *p == '\r') {
      out->push_back({line, p});
      if (*p == '\r' && p + 1 < end && p[1] == '\n') ++p;
      ++p;
      line = p;
    } else {
      ++p;
    }
  }
  if (line < end) out->push_back({line, end});
}

// Token stream with Python-identical semantics (mmcif.py::_tokenize).
class TokenStream {
 public:
  TokenStream(const char* data, Py_ssize_t size) {
    split_lines(data, size, &lines_);
  }

  // Returns false at end of input. On true, *sv points either into the
  // original buffer or into scratch_ (multiline fields; valid until the
  // next call).
  bool next(std::string_view* sv) {
    while (li_ < lines_.size()) {
      const Line& line = lines_[li_];
      if (pos_ == 0 && line.starts_semicolon()) {
        // Multiline text field: lines until one starting with ';'.
        scratch_.assign(line.b + 1, size_t(line.e - line.b - 1));
        ++li_;
        while (li_ < lines_.size() && !lines_[li_].starts_semicolon()) {
          scratch_.push_back('\n');
          scratch_.append(lines_[li_].b, size_t(lines_[li_].e - lines_[li_].b));
          ++li_;
        }
        ++li_;  // consume the closing ';' line
        pos_ = 0;
        *sv = scratch_;
        return true;
      }
      const char* b = line.b + pos_;
      const char* e = line.e;
      while (b < e && is_ws(*b)) ++b;
      if (b >= e || *b == '#') {
        ++li_;
        pos_ = 0;
        continue;
      }
      if (*b == '\'' || *b == '"') {
        const char q = *b;
        const char* t = b + 1;
        while (t < e && !(*t == q && (t + 1 == e || is_ws(t[1])))) ++t;
        *sv = std::string_view(b + 1, size_t(t - b - 1));
        pos_ = size_t(t + 1 - line.b);
        return true;
      }
      const char* t = b;
      while (t < e && !is_ws(*t)) ++t;
      *sv = std::string_view(b, size_t(t - b));
      pos_ = size_t(t - line.b);
      return true;
    }
    return false;
  }

 private:
  std::vector<Line> lines_;
  size_t li_ = 0;
  size_t pos_ = 0;  // offset within the current line
  std::string scratch_;
};

// Returns the (borrowed) list for cats[cat][item], creating empty
// dict/list entries as needed (Python's setdefault semantics — note a
// loop_ with tags but zero rows still creates the empty lists).
PyObject* get_column(PyObject* cats, std::string_view tag) {
  // tag.partition("."): cat = up to first '.', item = remainder.
  size_t dot = tag.find('.');
  std::string_view cat = (dot == std::string_view::npos)
                             ? tag
                             : tag.substr(0, dot);
  std::string_view item = (dot == std::string_view::npos)
                              ? std::string_view("")
                              : tag.substr(dot + 1);

  PyObject* cat_key = PyUnicode_FromStringAndSize(cat.data(),
                                                  Py_ssize_t(cat.size()));
  if (!cat_key) return nullptr;
  PyObject* items = PyDict_GetItem(cats, cat_key);  // borrowed
  if (!items) {
    items = PyDict_New();
    if (!items || PyDict_SetItem(cats, cat_key, items) < 0) {
      Py_XDECREF(items);
      Py_DECREF(cat_key);
      return nullptr;
    }
    Py_DECREF(items);  // still borrowed via cats
    items = PyDict_GetItem(cats, cat_key);
  }
  Py_DECREF(cat_key);

  PyObject* item_key = PyUnicode_FromStringAndSize(item.data(),
                                                   Py_ssize_t(item.size()));
  if (!item_key) return nullptr;
  PyObject* lst = PyDict_GetItem(items, item_key);  // borrowed
  if (!lst) {
    lst = PyList_New(0);
    if (!lst || PyDict_SetItem(items, item_key, lst) < 0) {
      Py_XDECREF(lst);
      Py_DECREF(item_key);
      return nullptr;
    }
    Py_DECREF(lst);
    lst = PyDict_GetItem(items, item_key);
  }
  Py_DECREF(item_key);
  return lst;
}

// cats[cat][item].append(value); returns 0 on success, -1 on error.
int append_value(PyObject* cats, std::string_view tag, PyObject* value) {
  PyObject* lst = get_column(cats, tag);
  if (!lst) return -1;
  return PyList_Append(lst, value);
}

PyObject* sv_to_unicode(std::string_view sv) {
  return PyUnicode_FromStringAndSize(sv.data(), Py_ssize_t(sv.size()));
}

PyObject* parse_categories(PyObject* /*self*/, PyObject* arg) {
  Py_ssize_t size = 0;
  const char* data = PyUnicode_AsUTF8AndSize(arg, &size);
  if (!data) return nullptr;

  PyObject* cats = PyDict_New();
  if (!cats) return nullptr;

  TokenStream ts(data, size);
  std::string_view tok;
  bool have = ts.next(&tok);

  // Loop-local buffers reused across loop_ blocks.
  std::vector<std::string> tags;
  std::vector<PyObject*> values;

  auto fail = [&]() -> PyObject* {
    for (PyObject* v : values) Py_XDECREF(v);
    Py_DECREF(cats);
    return nullptr;
  };

  while (have) {
    if (iprefix(tok, "data_") || iprefix(tok, "global_")) {
      have = ts.next(&tok);
      continue;
    }
    if (iequal(tok, "loop_")) {
      tags.clear();
      have = ts.next(&tok);
      while (have && !tok.empty() && tok[0] == '_') {
        tags.emplace_back(tok);
        have = ts.next(&tok);
      }
      values.clear();
      while (have &&
             !(iequal(tok, "loop_") || iequal(tok, "stop_") ||
               (!tok.empty() && tok[0] == '_') || iprefix(tok, "data_"))) {
        PyObject* v = sv_to_unicode(tok);
        if (!v) return fail();
        values.push_back(v);
        have = ts.next(&tok);
      }
      if (!tags.empty()) {
        size_t ncol = tags.size();
        size_t nrow = values.size() / ncol;
        for (size_t ci = 0; ci < ncol; ++ci) {
          PyObject* lst = get_column(cats, tags[ci]);
          if (!lst) return fail();
          for (size_t r = 0; r < nrow; ++r) {
            if (PyList_Append(lst, values[r * ncol + ci]) < 0) {
              return fail();
            }
          }
        }
      }
      for (PyObject* v : values) Py_DECREF(v);
      values.clear();
      continue;
    }
    if (!tok.empty() && tok[0] == '_') {
      // Simple tag-value pair. NOTE: the tag view may point into the
      // tokenizer's scratch buffer only for multiline tokens, which never
      // start with '_' at this branch unless the text block itself does —
      // copy to be safe before advancing the stream.
      std::string tag(tok);
      std::string_view val;
      if (!ts.next(&val)) break;
      PyObject* v = sv_to_unicode(val);
      if (!v) {
        Py_DECREF(cats);
        return nullptr;
      }
      int rc = append_value(cats, tag, v);
      Py_DECREF(v);
      if (rc < 0) {
        Py_DECREF(cats);
        return nullptr;
      }
      have = ts.next(&tok);
      continue;
    }
    have = ts.next(&tok);
  }
  return cats;
}

PyMethodDef methods[] = {
    {"parse_categories", parse_categories, METH_O,
     "CIF text -> {category: {item: [values...]}} "
     "(identical to the Python parse_cif_categories)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_cif_native",
    "Native CIF category parser (see cif_tokenizer.cpp)", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__cif_native(void) { return PyModule_Create(&module); }
