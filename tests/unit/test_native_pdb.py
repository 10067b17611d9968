"""Native C++ PDB formatter vs the pure-Python oracle: byte-identical
output on single models and trajectories (see
framedipt_tpu/native/pdb_writer.cpp; Python oracle
framedipt_tpu/data/protein.py::to_pdb / prots_to_pdb via
analysis/utils._as_protein)."""
import time

import numpy as np
import pytest

from framedipt_tpu.analysis.utils import _as_protein
from framedipt_tpu.data.protein import (
    format_models_native,
    prots_to_pdb,
    to_pdb,
)
from framedipt_tpu.native import load_pdb_native

pytestmark = pytest.mark.skipif(
    load_pdb_native() is None, reason="native toolchain unavailable"
)


def _case(rng, t, n, chains=1, zero_atoms=True, big=False):
    pos = rng.normal(size=(t, n, 37, 3)) * (1e4 if big else 12.0)
    # Backbone-only masking plus per-frame holes: the mask is derived from
    # the positions, so zeroed atoms must vanish from the output.
    mask = np.zeros((n, 37))
    mask[:, :5] = 1.0
    pos = pos * mask[None, ..., None]
    if zero_atoms:
        pos[:, ::7, 4] = 0.0  # drop CB on every 7th residue
        if t > 1:
            pos[1, 0, :] = 0.0  # whole residue absent in frame 1 only
    aatype = rng.integers(0, 21, size=n)  # incl. out-of-range -> UNK
    residue_index = rng.integers(1, 9999, size=n)
    chain_index = np.sort(rng.integers(0, chains, size=n))
    b_factors = np.where(
        rng.random((n, 1)) < 0.5, 100.0, 0.0
    ) * np.ones((n, 37))
    return pos, aatype, residue_index, chain_index, b_factors


def _python_text(pos, aatype, residue_index, chain_index, b_factors):
    prots = [
        _as_protein(frame, aatype, b_factors, residue_index, chain_index)
        for frame in pos
    ]
    if len(prots) == 1:
        return to_pdb(prots[0])
    return prots_to_pdb(prots)


@pytest.mark.parametrize(
    "t,n,chains,big",
    [(1, 20, 1, False), (1, 33, 3, False), (5, 24, 2, False), (2, 16, 1, True)],
)
def test_native_matches_python_bytes(t, n, chains, big):
    rng = np.random.default_rng(t * 100 + n)
    pos, aatype, residue_index, chain_index, b_factors = _case(
        rng, t, n, chains, big=big
    )
    native = format_models_native(
        pos, aatype, residue_index, chain_index, b_factors
    )
    assert native is not None
    assert native + "END\n" == _python_text(
        pos, aatype, residue_index, chain_index, b_factors
    )


def test_negative_and_rounding_coords():
    """Exact decimal formatting: negative zeros, .xxx5 halfway cases, and
    values that widen the 8.3f field must round identically to Python."""
    n = 4
    pos = np.zeros((1, n, 37, 3))
    pos[0, :, 1] = [
        [-0.0005, 0.0005, 123456.789],
        [-1.2345, 1.23449999, -99999.9999],
        [2.6665, -2.6675, 0.001],
        [-0.0001, 0.0, 7.77749999999],
    ]
    # Keep every CA present (mask needs sum(|xyz|) > 1e-7).
    pos[0, 3, 1, 1] = 1.0
    aatype = np.zeros(n, np.int64)
    resi = np.arange(1, n + 1)
    chain = np.zeros(n, np.int64)
    bfac = np.zeros((n, 37))
    native = format_models_native(pos, aatype, resi, chain, bfac)
    assert native + "END\n" == _python_text(pos, aatype, resi, chain, bfac)


def test_write_prot_to_pdb_uses_native(tmp_path):
    """The writer's fast path produces the same file the Python path did."""
    from framedipt_tpu.analysis.utils import write_prot_to_pdb

    rng = np.random.default_rng(0)
    pos, aatype, residue_index, chain_index, b_factors = _case(rng, 3, 18, 2)
    p = write_prot_to_pdb(
        pos, tmp_path / "traj", aatype=aatype, b_factors=b_factors,
        residue_index=residue_index, chain_index=chain_index,
        no_indexing=True,
    )
    assert p.read_text() == _python_text(
        pos, aatype, residue_index, chain_index, b_factors
    )


def test_nan_coordinates_dropped_like_python():
    """NaN positions must be masked out (Python's `sum > eps` is false for
    NaN); a `sum <= eps -> skip` formulation would invert that and emit
    'nan' ATOM records."""
    n = 3
    pos = np.zeros((1, n, 37, 3))
    pos[0, :, :3] = 1.0  # N, CA, C present
    pos[0, 1, 1, 0] = np.nan  # CA of residue 2 diverged
    aatype = np.zeros(n, np.int64)
    resi = np.arange(1, n + 1)
    chain = np.zeros(n, np.int64)
    bfac = np.zeros((n, 37))
    native = format_models_native(pos, aatype, resi, chain, bfac)
    assert "nan" not in native
    assert native + "END\n" == _python_text(pos, aatype, resi, chain, bfac)


def test_native_rejects_over_62_chains():
    """The Python path's Protein.__post_init__ raises for >62 chains; the
    native path must not silently alias chain letters modulo 62 instead."""
    n = 70
    pos = np.ones((1, n, 37, 3))
    with pytest.raises(ValueError, match="62 chains"):
        format_models_native(
            pos,
            np.zeros(n, np.int64),
            np.arange(1, n + 1),
            np.arange(n, dtype=np.int64),  # 70 distinct chains
            np.zeros((n, 37)),
        )


def test_locale_independent_formatting():
    """%f is LC_NUMERIC-dependent in C; the extension pins the C locale so
    a comma-decimal host locale cannot corrupt coordinates."""
    import locale

    try:
        locale.setlocale(locale.LC_NUMERIC, "de_DE.UTF-8")
    except locale.Error:
        pytest.skip("de_DE.UTF-8 locale not installed")
    try:
        rng = np.random.default_rng(3)
        pos, aatype, residue_index, chain_index, b_factors = _case(rng, 1, 8)
        native = format_models_native(
            pos, aatype, residue_index, chain_index, b_factors
        )
        assert "," not in native
        assert native + "END\n" == _python_text(
            pos, aatype, residue_index, chain_index, b_factors
        )
    finally:
        locale.setlocale(locale.LC_NUMERIC, "C")


def test_concurrent_formatting_threads():
    """The extension releases the GIL during formatting (serve.py handler
    threads); concurrent calls over distinct inputs must not corrupt each
    other's buffers or output."""
    import concurrent.futures

    cases = [_case(np.random.default_rng(i), 3, 40, 2) for i in range(8)]
    expected = [format_models_native(*c) for c in cases]
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        got = list(pool.map(lambda c: format_models_native(*c), cases))
    assert got == expected


def test_native_is_faster():
    rng = np.random.default_rng(1)
    pos, aatype, residue_index, chain_index, b_factors = _case(rng, 40, 128)
    t0 = time.perf_counter()
    native = format_models_native(
        pos, aatype, residue_index, chain_index, b_factors
    )
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    python = _python_text(pos, aatype, residue_index, chain_index, b_factors)
    t_python = time.perf_counter() - t0
    assert native + "END\n" == python
    # Conservative bar (measured ~20x); guards accidental fallback.
    assert t_native * 3 < t_python, (t_native, t_python)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
