"""Native (C++) runtime components, built on demand with the system
toolchain and always paired with a pure-Python fallback.

Currently: `_cif_native.parse_categories`, a CPython extension replacing
the Python CIF tokenizer on the dataset-preprocessing hot path (~20x; see
cif_tokenizer.cpp). `load_cif_native()` returns the extension module or
None — callers must treat None as "use the Python implementation".

Build artifacts land next to the sources (framedipt_tpu/native/_build/)
keyed by interpreter tag, so a wheel cache or read-only install degrades
gracefully to the fallback.
"""
from __future__ import annotations

import importlib.util
import os
import pathlib
import subprocess
import sys
import sysconfig
import threading

_DIR = pathlib.Path(__file__).resolve().parent
_LOCK = threading.Lock()
_CACHE: dict[str, object] = {}


def _ext_path(name: str) -> pathlib.Path:
    tag = sysconfig.get_config_var("SOABI") or "unknown"
    return _DIR / "_build" / f"{name}.{tag}.so"


def _build(name: str, source: pathlib.Path, out: pathlib.Path) -> bool:
    include = sysconfig.get_paths()["include"]
    try:
        out.parent.mkdir(parents=True, exist_ok=True)
    except OSError:
        return False
    # PID-unique temp so two concurrent processes never clobber each
    # other's half-written artifact; the final rename stays atomic.
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", str(source), "-o", str(tmp),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        sys.stderr.write(
            f"framedipt_tpu.native: build of {name} failed "
            f"(falling back to Python):\n{proc.stderr[-2000:]}\n"
        )
        return False
    try:
        tmp.replace(out)  # atomic within the directory
    except OSError:
        return False
    return True


def _load(name: str, source: str) -> object | None:
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        ext = _ext_path(name)
        src = _DIR / source
        try:
            stale = not ext.exists() or ext.stat().st_mtime < src.stat().st_mtime
        except OSError:  # source-less install: use the artifact if present
            stale = not ext.exists()
        if stale:
            if not _build(name, src, ext):
                _CACHE[name] = None
                return None
        try:
            spec = importlib.util.spec_from_file_location(name, ext)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception as e:  # SIGILL-safe it is not, but import errors are
            sys.stderr.write(
                f"framedipt_tpu.native: import of {name} failed "
                f"(falling back to Python): {e}\n"
            )
            mod = None
        _CACHE[name] = mod
        return mod


def load_cif_native() -> object | None:
    """The `_cif_native` extension module, or None if unavailable."""
    return _load("_cif_native", "cif_tokenizer.cpp")


def load_pdb_native() -> object | None:
    """The `_pdb_native` extension module, or None if unavailable."""
    return _load("_pdb_native", "pdb_writer.cpp")
