"""Native C++ CIF tokenizer vs the pure-Python oracle: dict-identical
output on real fixtures and an adversarial grammar corpus (see
framedipt_tpu/native/cif_tokenizer.cpp; Python oracle
framedipt_tpu/data/mmcif.py::parse_cif_categories_py)."""
import pathlib

import pytest

from framedipt_tpu.data.mmcif import parse_cif_categories_py
from framedipt_tpu.native import load_cif_native

FIXTURES = sorted(
    (pathlib.Path(__file__).parents[1] / "data" / "cifs").glob("*.cif")
)

GRAMMAR_CORPUS = [
    # quoted values incl. embedded other-quote and quote-not-before-space
    "_a.b 'hello world'\n_a.c \"it's fine\"\n_a.d 'don't stop'\n",
    # comments: full-line, trailing, and '#' inside quotes
    "_a.b 1 # trailing\n# full line\n_a.c '#not a comment'\n",
    # multiline semicolon text fields, incl. one containing loop_ keywords
    "_e.f\n;first line\nsecond line\n;\n_e.g 2\n",
    "_e.f\n;loop_\n_fake.tag\n;\n_e.g 2\n",
    # loop with multiline value
    "loop_\n_l.a\n_l.b\n1\n;multi\nline\n;\n2 x\n",
    # empty loop (tags, no rows) — Python creates empty lists
    "loop_\n_l.a\n_l.b\nloop_\n_m.a\n1\n",
    # ragged loop (extra values dropped to full rows)
    "loop_\n_l.a\n_l.b\n1 2 3\n",
    # stop_ terminator and case-insensitive keywords
    "LOOP_\n_l.a\n1\nSTOP_\n_m.b 2\n",
    # data_ blocks and global_
    "data_block1\n_a.b 1\nDATA_two\nglobal_\n_c.d 2\n",
    # unterminated quote runs to end of line
    "_a.b 'unterminated\n_a.c 2\n",
    # tags without category dot
    "_plain value\n",
    # CRLF line endings and lone CR
    "_a.b 1\r\n_a.c 2\r_a.d 3\n",
    # empty text / whitespace only
    "",
    "   \n\t\n",
    # values that look like keywords inside a simple pair
    "_a.b loop_\n_a.c data_x\n",
    # '?' and '.' placeholders
    "loop_\n_l.a\n_l.b\n? .\n. ?\n",
    # trailing loop at EOF without newline
    "loop_\n_l.a\n1 2 3",
]


@pytest.fixture(scope="module")
def native():
    mod = load_cif_native()
    if mod is None:
        pytest.skip("native CIF extension unavailable (no toolchain)")
    return mod


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_fixture_files_identical(native, path):
    text = path.read_text()
    assert native.parse_categories(text) == parse_cif_categories_py(text)


@pytest.mark.parametrize("i", range(len(GRAMMAR_CORPUS)))
def test_grammar_corpus_identical(native, i):
    text = GRAMMAR_CORPUS[i]
    assert native.parse_categories(text) == parse_cif_categories_py(text)


def test_parse_mmcif_uses_native_transparently(native):
    """End-to-end parse through the routed entry point still works."""
    from framedipt_tpu.data.mmcif import parse_mmcif

    obj = parse_mmcif(FIXTURES[0])
    assert obj.chains
    for chain in obj.chains.values():
        assert chain.atom_positions.shape[1:] == (37, 3)


def test_native_is_materially_faster(native):
    import time

    text = FIXTURES[0].read_text()
    t0 = time.perf_counter()
    native.parse_categories(text)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    parse_cif_categories_py(text)
    t_py = time.perf_counter() - t0
    # Conservative bound (measured ~15x); catches silently falling back.
    assert t_py / t_nat > 3, (t_py, t_nat)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
