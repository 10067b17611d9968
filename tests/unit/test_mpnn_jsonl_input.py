"""parse-chains jsonl dataset input + the CA-only design-path fix.

The runner's second input mode (protein_mpnn_run.py:147-158: a
parse_multiple_chains.py jsonl read by StructureDataset) maps to
``mpnn_design --jsonl_path``. CA-only checkpoints must read the CA
column — not atom 0 (N) — when fed full-backbone PDBs
(CA_ProteinFeatures contract, utils :718-894).
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from framedipt_tpu.data.protein import Protein, to_pdb
from framedipt_tpu.model import mpnn
from framedipt_tpu.tools import mpnn_design, mpnn_helpers
from framedipt_tpu.tools.external import ToolUnavailable

from .geom_helpers import nerf_backbone
from .test_mpnn_design import CFG, _two_chain_pdb


@pytest.fixture(scope="module")
def params():
    import jax

    return mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)


def test_parse_chains_entry_format(tmp_path):
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    entry = mpnn_helpers.parse_pdb_entry(tmp_path / "case.pdb")
    assert entry["name"] == "case" and entry["num_of_chains"] == 2
    assert len(entry["seq_chain_A"]) == 14 and len(entry["seq_chain_B"]) == 10
    assert entry["seq"] == entry["seq_chain_A"] + entry["seq_chain_B"]
    ca = np.asarray(entry["coords_chain_A"]["CA_chain_A"])
    assert ca.shape == (14, 3) and np.isfinite(ca).all()
    # CA-only parse writes only the CA record
    e2 = mpnn_helpers.parse_pdb_entry(tmp_path / "case.pdb", ca_only=True)
    assert set(e2["coords_chain_B"]) == {"CA_chain_B"}


def test_parse_chains_numbering_gap_becomes_dash(tmp_path):
    n = 10
    atom37, mask37 = nerf_backbone(n)
    residue_index = np.arange(1, n + 1)
    residue_index[5:] += 3  # a 3-residue numbering gap after residue 5
    (tmp_path / "gap.pdb").write_text(to_pdb(Protein(
        atom_positions=atom37, atom_mask=mask37,
        aatype=np.arange(n) % 20, residue_index=residue_index,
        chain_index=np.zeros(n, np.int32), b_factors=np.zeros((n, 37)),
    )))
    entry = mpnn_helpers.parse_pdb_entry(tmp_path / "gap.pdb")
    seq = entry["seq_chain_A"]
    assert len(seq) == n + 3 and seq[5:8] == "---"
    ca = np.asarray(entry["coords_chain_A"]["CA_chain_A"])
    assert np.isnan(ca[5:8]).all() and np.isfinite(ca[:5]).all()
    # and the design consumer masks the gap residues
    name, chains = mpnn_design.chains_from_parsed_entry(entry)
    feats = mpnn.featurize_chains(chains)
    assert feats["mask"][0, 5:8].sum() == 0
    assert feats["mask"][0].sum() == n


def test_jsonl_path_design_matches_pdb_dir(tmp_path, params):
    """Same structure, both input modes, same seed -> identical fasta."""
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    (pdb_dir / "case.pdb").write_text(_two_chain_pdb())
    jsonl = tmp_path / "parsed.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(jsonl),
        "parse-chains",
    ])
    d1 = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o1", num_seq_per_target=2, params=params,
        cfg=CFG,
    )
    d2 = mpnn_design.design_sequences(
        None, tmp_path / "o2", num_seq_per_target=2, params=params,
        cfg=CFG, jsonl_path=jsonl,
    )
    assert (d1 / "case.fa").read_text() == (d2 / "case.fa").read_text()


def test_iter_cases_input_validation(tmp_path):
    with pytest.raises(ToolUnavailable):
        mpnn_design.iter_cases(None, None)
    with pytest.raises(ToolUnavailable):
        mpnn_design.iter_cases(tmp_path, tmp_path / "x.jsonl")
    with pytest.raises(ToolUnavailable):
        mpnn_design.iter_cases(None, tmp_path / "missing.jsonl")
    empty = tmp_path / "empty.jsonl"
    empty.write_text("\n")
    with pytest.raises(ToolUnavailable):
        mpnn_design.iter_cases(None, empty)


def test_ca_only_design_ignores_non_ca_atoms(tmp_path, params):
    """CA-only checkpoints must key on CA coords alone: perturbing N/C/O
    (CA untouched) must not change the design. Guards against reading
    atom column 0 (N) as CA when full-backbone PDBs are fed."""
    import jax

    ca_cfg = mpnn.MPNNConfig(k_neighbors=12, ca_only=True)
    ca_params = mpnn.init_mpnn_params(jax.random.PRNGKey(1), ca_cfg)
    d1 = tmp_path / "p1"
    d2 = tmp_path / "p2"
    d1.mkdir(), d2.mkdir()
    pdb_text = _two_chain_pdb()
    (d1 / "case.pdb").write_text(pdb_text)
    # rebuild with N/C/O displaced, CA identical
    n = 24
    atom37, mask37 = nerf_backbone(n)
    atom37 = atom37.copy()
    atom37[14:] += np.array([25.0, 0.0, 0.0])
    from framedipt_tpu.data import constants as rc

    shifted = atom37.copy()
    for a in ("N", "C", "O"):
        shifted[:, rc.atom_order[a]] += np.array([1.3, -0.8, 0.6])
    (d2 / "case.pdb").write_text(to_pdb(Protein(
        atom_positions=shifted, atom_mask=mask37,
        aatype=np.arange(n) % 20,
        residue_index=np.concatenate(
            [np.arange(1, 15), np.arange(1, 11)]
        ),
        chain_index=np.concatenate(
            [np.zeros(14, np.int32), np.ones(10, np.int32)]
        ),
        b_factors=np.zeros((n, 37)),
    )))
    f1 = mpnn_design.design_sequences(
        d1, tmp_path / "o1", num_seq_per_target=2, params=ca_params,
        cfg=ca_cfg,
    )
    f2 = mpnn_design.design_sequences(
        d2, tmp_path / "o2", num_seq_per_target=2, params=ca_params,
        cfg=ca_cfg,
    )
    assert (f1 / "case.fa").read_text() == (f2 / "case.fa").read_text()


def test_cli_jsonl_path_mode(tmp_path):
    from .test_mpnn_design import _write_npz_weights

    w = tmp_path / "w.npz"
    _write_npz_weights(w)
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    (pdb_dir / "case.pdb").write_text(_two_chain_pdb())
    jsonl = tmp_path / "parsed.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(jsonl),
        "parse-chains",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--out_folder", str(out),
        "--weights_path", str(w), "--num_seq_per_target", "2",
    ])
    fa = (out / "seqs" / "case.fa").read_text().splitlines()
    assert len(fa) == 2 * (1 + 2) and fa[0].startswith(">case")
    # exactly-one-input validation
    with pytest.raises(SystemExit):
        mpnn_design.main([
            "--jsonl_path", str(jsonl), "--pdb_dir", str(pdb_dir),
            "--out_folder", str(out), "--weights_path", str(w),
        ])


def test_entry_missing_seq_chain_fails_loud():
    with pytest.raises(ToolUnavailable):
        mpnn_design.chains_from_parsed_entry({"name": "x"})
