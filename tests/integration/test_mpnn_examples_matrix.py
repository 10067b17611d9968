"""The reference's examples/ suite as one contract matrix.

ProteinMPNN ships 9 submit scripts (`ProteinMPNN/examples/
submit_example_{1..8,3_score_only}.sh`) that exercise the runner surface
end-to-end: jsonl datasets, chain assignment, fixed/tied positions,
homooligomer ties, probability outputs, composition bias. Each case below
is the same invocation shape through `tools/mpnn_design` + the
`tools/mpnn_helpers` generators (the helper_scripts equivalents), with
one semantic assertion per example on top of the artifact contract.
Flag-level behavior is covered in depth by tests/unit/test_mpnn_* — this
file pins the reference's own documented workflows as single chains.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from framedipt_tpu.data.protein import Protein, to_pdb
from framedipt_tpu.tools import mpnn_design, mpnn_helpers

from tests.unit.geom_helpers import nerf_backbone
from tests.unit.test_mpnn_design import _two_chain_pdb, _write_npz_weights


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    w = tmp_path_factory.mktemp("w") / "w.npz"
    _write_npz_weights(w)
    return w


@pytest.fixture(scope="module")
def pdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    (d / "case.pdb").write_text(_two_chain_pdb())
    return d


def _parse(tmp_path, pdb_dir):
    jsonl = tmp_path / "parsed_pdbs.jsonl"
    mpnn_helpers.main(
        ["--pdb_dir", str(pdb_dir), "--output_path", str(jsonl),
         "parse-chains"]
    )
    return jsonl


def _fasta_seqs(out):
    recs = (out / "seqs" / "case.fa").read_text().splitlines()
    return [recs[i + 1] for i in range(0, len(recs), 2)]


def test_example_1_jsonl_dataset_design(tmp_path, weights, pdb_dir):
    """submit_example_1.sh: parse_multiple_chains -> --jsonl_path design."""
    jsonl = _parse(tmp_path, pdb_dir)
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--out_folder", str(out),
        "--weights_path", str(weights), "--num_seq_per_target", "3",
        "--sampling_temp", "0.1", "--seed", "37", "--batch_size", "1",
    ])
    seqs = _fasta_seqs(out)
    assert len(seqs) == 1 + 3  # native record + 3 samples
    assert all("/" in s for s in seqs)  # two chains joined by /


def test_example_2_assigned_chains(tmp_path, weights, pdb_dir):
    """submit_example_2.sh: assign_fixed_chains(B designed) ->
    --chain_id_jsonl; the non-designed chain A returns verbatim."""
    jsonl = _parse(tmp_path, pdb_dir)
    assigned = tmp_path / "assigned_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(assigned),
        "assign-chains", "--chain_list", "B",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--chain_id_jsonl", str(assigned),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--seed", "37",
    ])
    native, *samples = _fasta_seqs(out)
    nat_a = native.split("/")[0]
    for s in samples:
        assert s.split("/")[0] == nat_a  # chain A fixed


def test_example_3_single_pdb_chain_subset(tmp_path, weights, pdb_dir):
    """submit_example_3.sh: --pdb_path + --pdb_path_chains."""
    out = tmp_path / "out"
    mpnn_design.main([
        "--pdb_path", str(pdb_dir / "case.pdb"), "--pdb_path_chains", "A B",
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--sampling_temp", "0.1", "--seed", "37",
    ])
    assert len(_fasta_seqs(out)) == 1 + 2


def test_example_3_score_only(tmp_path, weights, pdb_dir):
    """submit_example_3_score_only.sh: score input backbone-seq pairs."""
    out = tmp_path / "out"
    mpnn_design.main([
        "--pdb_path", str(pdb_dir / "case.pdb"),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "3", "--score_only", "--seed", "37",
    ])
    npz = np.load(out / "score_only" / "case.npz")
    assert npz["score"].shape == (3,) and np.isfinite(npz["score"]).all()


def test_example_4_fixed_positions(tmp_path, weights, pdb_dir):
    """submit_example_4.sh: make_fixed_positions_dict -> fixed residues
    1-5 of chain A come back as the native letters."""
    jsonl = _parse(tmp_path, pdb_dir)
    fixed = tmp_path / "fixed_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(fixed),
        "fixed-positions", "--chain_list", "A",
        "--position_list", "1 2 3 4 5",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--fixed_positions_jsonl", str(fixed),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--seed", "37",
    ])
    native, *samples = _fasta_seqs(out)
    for s in samples:
        assert s.split("/")[0][:5] == native.split("/")[0][:5]


def test_example_4_non_fixed(tmp_path, weights, pdb_dir):
    """submit_example_4_non_fixed.sh: --specify_non_fixed inverts the
    list — only positions 1-5 of A are designable, so 6.. are native."""
    jsonl = _parse(tmp_path, pdb_dir)
    fixed = tmp_path / "fixed_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(fixed),
        "fixed-positions", "--chain_list", "A",
        "--position_list", "1 2 3 4 5", "--specify_non_fixed",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--fixed_positions_jsonl", str(fixed),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--seed", "37",
    ])
    native, *samples = _fasta_seqs(out)
    for s in samples:
        assert s.split("/")[0][5:] == native.split("/")[0][5:]


def test_example_5_tied_positions(tmp_path, weights, pdb_dir):
    """submit_example_5.sh: make_tied_positions_dict over explicit
    positions — tied sites sample the same letter across chains."""
    jsonl = _parse(tmp_path, pdb_dir)
    tied = tmp_path / "tied_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(tied),
        "tied-positions", "--chain_list", "A B",
        "--position_list", "1 2 3, 1 2 3",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--tied_positions_jsonl", str(tied),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--seed", "37",
    ])
    for s in _fasta_seqs(out)[1:]:
        a, b = s.split("/")
        assert a[:3] == b[:3]


def test_example_6_homooligomer(tmp_path, weights):
    """submit_example_6.sh: --homooligomer 1 ties whole equal-length
    chains — every sample's two chains are identical."""
    n = 12
    atom37, mask37 = nerf_backbone(2 * n)
    pdb_dir = tmp_path / "homo"
    pdb_dir.mkdir()
    (pdb_dir / "case.pdb").write_text(to_pdb(Protein(
        atom_positions=atom37, atom_mask=mask37,
        aatype=np.arange(2 * n) % 20,
        residue_index=np.concatenate([np.arange(1, n + 1)] * 2),
        chain_index=np.repeat([0, 1], n),
        b_factors=np.zeros((2 * n, 37)),
    )))
    jsonl = _parse(tmp_path, pdb_dir)
    tied = tmp_path / "tied_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(tied),
        "tied-positions", "--homooligomer", "1",
    ])
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--tied_positions_jsonl", str(tied),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "2", "--sampling_temp", "0.2", "--seed", "37",
    ])
    for s in _fasta_seqs(out)[1:]:
        a, b = s.split("/")
        assert a == b


def test_example_7_unconditional_probs(tmp_path, weights, pdb_dir):
    """submit_example_7.sh: --unconditional_probs_only npz contract."""
    jsonl = _parse(tmp_path, pdb_dir)
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--out_folder", str(out),
        "--weights_path", str(weights), "--num_seq_per_target", "1",
        "--unconditional_probs_only", "--seed", "37",
    ])
    npz = np.load(out / "unconditional_probs_only" / "case.npz")
    probs = np.exp(npz["log_p"])
    L = npz["S"].shape[-1]
    assert probs.shape[-2:] == (L, 21)
    np.testing.assert_allclose(
        probs.sum(-1), np.ones(probs.shape[:-1]), atol=1e-4
    )


def test_example_8_bias_aa(tmp_path, weights, pdb_dir):
    """submit_example_8.sh: make_bias_AA -> --bias_AA_jsonl; a huge
    positive W bias makes tryptophan dominate designed positions."""
    jsonl = _parse(tmp_path, pdb_dir)
    bias = tmp_path / "bias_pdbs.jsonl"
    mpnn_helpers.main([
        "--pdb_dir", str(pdb_dir), "--output_path", str(bias),
        "bias-aa", "--AA_list", "W", "--bias_list", "50.0",
    ])
    assert json.loads(bias.read_text())["W"] == 50.0
    out = tmp_path / "out"
    mpnn_design.main([
        "--jsonl_path", str(jsonl), "--bias_AA_jsonl", str(bias),
        "--out_folder", str(out), "--weights_path", str(weights),
        "--num_seq_per_target", "1", "--seed", "37",
    ])
    sample = _fasta_seqs(out)[1].replace("/", "")
    assert sample.count("W") >= int(0.9 * len(sample))
