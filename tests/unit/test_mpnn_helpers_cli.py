"""Restraint-jsonl generators (reference helper_scripts parity).

Output formats must match the reference examples verbatim
(make_fixed_positions_dict.py:46-47, make_tied_positions_dict.py:59-61,
make_pos_neg_tied_positions_dict.py:72-73, assign_fixed_chains.py:38-39,
make_bias_AA.py:26-27) and round-trip through tools/mpnn_restraints.py.
"""
from __future__ import annotations

import json

import pytest

from framedipt_tpu.tools import mpnn_helpers, mpnn_restraints

from .test_mpnn_design import _two_chain_pdb


@pytest.fixture()
def pdb(tmp_path):
    path = tmp_path / "case.pdb"
    path.write_text(_two_chain_pdb())  # chains A(14) / B(10)
    return path


def test_chain_lengths_from_pdb(pdb):
    assert mpnn_helpers.chain_lengths_from_pdb(pdb) == {"A": 14, "B": 10}


def test_fixed_positions_cli(pdb, tmp_path):
    out = tmp_path / "fixed.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "fixed-positions", "--chain_list", "A", "--position_list", "1 2 5",
    ])
    d = json.loads(out.read_text())
    assert d == {"case": {"A": [1, 2, 5], "B": []}}
    # the consumer accepts it directly
    m = mpnn_restraints.chain_m_pos_from_dict(
        mpnn_restraints.resolve_name(d, "case"), ["A", "B"], [14, 10]
    )
    assert m.sum() == 24 - 3


def test_fixed_positions_specify_non_fixed(pdb, tmp_path):
    """--specify_non_fixed: listed positions are the DESIGNED ones;
    everything else (incl. whole unlisted chains) is fixed
    (make_fixed_positions_dict.py:28-41)."""
    out = tmp_path / "fixed.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "fixed-positions", "--chain_list", "A",
        "--position_list", "1 2 3", "--specify_non_fixed",
    ])
    d = json.loads(out.read_text())["case"]
    assert d["A"] == list(range(4, 15))
    assert d["B"] == list(range(1, 11))


def test_tied_positions_explicit(pdb, tmp_path):
    out = tmp_path / "tied.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "tied-positions", "--chain_list", "A B",
        "--position_list", "1 3, 2 4",
    ])
    d = json.loads(out.read_text())
    assert d == {"case": [{"A": [1], "B": [2]}, {"A": [3], "B": [4]}]}
    groups, beta = mpnn_restraints.tied_positions_from_list(
        d["case"], ["A", "B"], [14, 10]
    )
    assert groups == ((0, 15), (2, 17)) and beta.min() == beta.max() == 1.0


def test_tied_positions_homooligomer(pdb, tmp_path):
    """--homooligomer 1: residue i tied across ALL chains
    (make_tied_positions_dict.py:30-43); unequal chains fail loud
    (upstream silently emits out-of-range ties)."""
    dimer = tmp_path / "dimer.pdb"
    dimer.write_text(_two_chain_pdb(12, 12))
    out = tmp_path / "tied.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(dimer), "--output_path", str(out),
        "tied-positions", "--homooligomer", "1",
    ])
    d = json.loads(out.read_text())["dimer"]
    assert len(d) == 12
    assert d[0] == {"A": [1], "B": [1]} and d[11] == {"A": [12], "B": [12]}
    with pytest.raises(SystemExit):
        mpnn_helpers.main([
            "--pdb_path", str(pdb), "--output_path", str(out),
            "tied-positions", "--homooligomer", "1",
        ])


def test_tied_positions_pos_neg_betas(tmp_path):
    """pos/neg design: weighted [[pos],[beta]] members
    (make_pos_neg_tied_positions_dict.py:44-54). Homooligomer ties use
    the first chain's length, so chains must be equal-length (same
    assumption as the reference helper)."""
    dimer = tmp_path / "dimer.pdb"
    dimer.write_text(_two_chain_pdb(12, 12))
    out = tmp_path / "tied.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(dimer), "--output_path", str(out),
        "tied-positions", "--homooligomer", "1",
        "--pos_neg_chain_list", "A B", "--pos_neg_chain_betas", "1.0 -0.5",
    ])
    d = json.loads(out.read_text())["dimer"]
    assert d[0] == {"A": [[1], [1.0]], "B": [[1], [-0.5]]}
    groups, beta = mpnn_restraints.tied_positions_from_list(
        d, ["A", "B"], [12, 12]
    )
    assert beta[0] == 1.0 and beta[12] == -0.5


def test_bias_aa_cli(tmp_path):
    out = tmp_path / "bias.jsonl"
    mpnn_helpers.main([
        "--output_path", str(out),
        "bias-aa", "--AA_list", "A G", "--bias_list", "-0.01 0.02",
    ])
    assert json.loads(out.read_text()) == {"A": -0.01, "G": 0.02}
    with pytest.raises(SystemExit):
        mpnn_helpers.main([
            "--output_path", str(out),
            "bias-aa", "--AA_list", "A G", "--bias_list", "1.0",
        ])


def test_bias_per_res_cli(pdb, tmp_path):
    out = tmp_path / "bias.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "bias-per-res", "--chain", "B", "--positions", "2 4",
        "--AA_list", "G L", "--bias", "100.5",
    ])
    d = json.loads(out.read_text())
    arr = mpnn_restraints.bias_by_res_from_dict(
        mpnn_restraints.resolve_name(d, "case"), ["A", "B"], [14, 10]
    )
    g = mpnn_helpers.ALPHABET.index("G")
    assert arr[0, 14 + 1, g] == 100.5 and arr[0, 14 + 3, g] == 100.5
    assert arr.sum() == 4 * 100.5


def test_assign_chains_cli(pdb, tmp_path):
    out = tmp_path / "chains.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "assign-chains", "--chain_list", "B",
    ])
    assert json.loads(out.read_text()) == {"case": [["B"], ["A"]]}


def test_requires_one_input(tmp_path):
    with pytest.raises(SystemExit):
        mpnn_helpers.main([
            "--output_path", str(tmp_path / "x.jsonl"),
            "fixed-positions", "--chain_list", "A", "--position_list", "1",
        ])


def test_omit_aa_cli(pdb, tmp_path):
    """other_tools/make_omit_AA.py format: {name: {chain: [[[pos], "AAS"],
    ...]}} — group grammar, empty lists for unlisted chains, and the
    consumer's mask round-trip."""
    out = tmp_path / "omit.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "omit-aa", "--chain", "A",
        "--position_list", "1 2 3, 7 8", "--AA_list", "GPL WC",
    ])
    d = json.loads(out.read_text())
    assert d == {"case": {
        "A": [[[1, 2, 3], "GPL"], [[7, 8], "WC"]], "B": [],
    }}
    m = mpnn_restraints.omit_aa_mask_from_dict(
        mpnn_restraints.resolve_name(d, "case"), ["A", "B"], [14, 10]
    )
    g = mpnn_helpers.ALPHABET.index("G")
    w = mpnn_helpers.ALPHABET.index("W")
    assert m[0, 0, g] == 1.0 and m[0, 6, w] == 1.0 and m[0, 6, g] == 0.0
    assert m.sum() == 3 * 3 + 2 * 2


def test_omit_aa_validation(pdb, tmp_path):
    out = tmp_path / "omit.jsonl"
    for bad in (
        ["--chain", "Z", "--position_list", "1", "--AA_list", "G"],
        ["--chain", "A", "--position_list", "99", "--AA_list", "G"],
        ["--chain", "A", "--position_list", "1, 2", "--AA_list", "G"],
    ):
        with pytest.raises(SystemExit):
            mpnn_helpers.main([
                "--pdb_path", str(pdb), "--output_path", str(out),
                "omit-aa", *bad,
            ])


def _write_pssm(path, n_rows, rng):
    """A .pssm text file in the layout make_pssm_dict.py:14-25 parses:
    2 header lines, then per row 4 junk chars + >=40 floats."""
    log_odds = rng.standard_normal((n_rows, 20)).round(3)
    probs = rng.random((n_rows, 20)).round(3)
    lines = ["# pssm", "# header"]
    for i in range(n_rows):
        vals = " ".join(str(v) for v in (*log_odds[i], *probs[i]))
        lines.append(f"{i:>3d} {vals}")
    path.write_text("\n".join(lines) + "\n")
    return log_odds


def test_pssm_cli_roundtrip(pdb, tmp_path):
    import numpy as np

    rng = np.random.default_rng(0)
    pssm_path = tmp_path / "chain.pssm"
    log_odds = _write_pssm(pssm_path, 14, rng)
    out = tmp_path / "pssm.jsonl"
    mpnn_helpers.main([
        "--pdb_path", str(pdb), "--output_path", str(out),
        "pssm", "--pssm_path", str(pssm_path), "--chains", "A",
        "--coef", "0.8",
    ])
    d = json.loads(out.read_text())["case"]
    assert set(d) == {"A"}
    entry = d["A"]
    bias = np.asarray(entry["pssm_bias"])
    assert bias.shape == (14, 21)
    # rows are distributions with the X column ~0 (the -1e8 mask)
    np.testing.assert_allclose(bias.sum(-1), 1.0, atol=1e-6)
    x_col = mpnn_helpers.ALPHABET.index("X")
    assert bias[:, x_col].max() == 0.0
    # log-odds survive the alphabet permutation: input col 0 ('A'
    # in ARND...) lands on the MPNN alphabet's A column
    lo = np.asarray(entry["pssm_log_odds"])
    np.testing.assert_allclose(lo[:, mpnn_helpers.ALPHABET.index("A")],
                               log_odds[:, 0], atol=1e-9)
    np.testing.assert_allclose(lo[:, x_col], 0.0)
    assert entry["pssm_coef"] == [0.8] * 14
    # consumer round-trip: chain B (no entry) gets coef 0 / mask all-True
    coef, b, mask = mpnn_restraints.pssm_tensors_from_dict(
        mpnn_restraints.resolve_name(d, "case"), ["A", "B"], [14, 10]
    )
    assert coef[0, :14].min() == np.float32(0.8) and coef[0, 14:].max() == 0.0
    assert mask[0, 14:].all()


def test_pssm_length_mismatch_fails_loud(pdb, tmp_path):
    import numpy as np

    pssm_path = tmp_path / "short.pssm"
    _write_pssm(pssm_path, 5, np.random.default_rng(1))
    with pytest.raises(SystemExit):
        mpnn_helpers.main([
            "--pdb_path", str(pdb), "--output_path", str(tmp_path / "o"),
            "pssm", "--pssm_path", str(pssm_path), "--chains", "A",
        ])
