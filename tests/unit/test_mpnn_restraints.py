"""Reference-format MPNN restraint jsonl plumbing.

Dict shapes per protein_mpnn_utils.tied_featurize:286-337 and the runner
flags protein_mpnn_run.py:93-136,220,291 (--omit_AA_jsonl,
--bias_by_res_jsonl, --tied_positions_jsonl, --pssm_jsonl + knobs).
Behavioral tests run the real design path with synthetic weights and
assert the restraint is *obeyed in every sample*.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from framedipt_tpu.model import mpnn
from framedipt_tpu.tools import mpnn_design, mpnn_restraints
from framedipt_tpu.tools.external import ToolUnavailable

from .test_mpnn_design import CFG, _two_chain_pdb

LETTERS = ["A", "B"]
LENS = [14, 10]


@pytest.fixture(scope="module")
def params():
    import jax

    return mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)


# ---------------------------------------------------------------- builders


def test_chain_m_pos_from_dict():
    m = mpnn_restraints.chain_m_pos_from_dict({"A": [1, 5], "B": [2]},
                                              LETTERS, LENS)
    assert m.shape == (1, 24)
    assert m[0, 0] == 0.0 and m[0, 4] == 0.0 and m[0, 14 + 1] == 0.0
    assert m.sum() == 24 - 3


def test_omit_aa_mask_from_dict():
    m = mpnn_restraints.omit_aa_mask_from_dict(
        {"B": [[[1, 3], "CW"]]}, LETTERS, LENS
    )
    assert m.shape == (1, 24, 21)
    c, w = mpnn.MPNN_ALPHABET.index("C"), mpnn.MPNN_ALPHABET.index("W")
    for pos in (14 + 0, 14 + 2):
        assert m[0, pos, c] == 1.0 and m[0, pos, w] == 1.0
    assert m.sum() == 4


def test_bias_by_res_from_dict_shape_check():
    rows = np.zeros((10, 21)); rows[2, 5] = 3.0
    b = mpnn_restraints.bias_by_res_from_dict(
        {"B": rows.tolist()}, LETTERS, LENS
    )
    assert b[0, 14 + 2, 5] == 3.0 and b.sum() == 3.0
    with pytest.raises(ToolUnavailable):
        mpnn_restraints.bias_by_res_from_dict(
            {"B": np.zeros((9, 21)).tolist()}, LETTERS, LENS
        )


def test_pssm_tensors_defaults_and_threshold():
    entry = {
        "pssm_coef": [1.0] * 14,
        "pssm_bias": np.full((14, 21), 1 / 21).tolist(),
        "pssm_log_odds": np.zeros((14, 21)).tolist(),
    }
    coef, bias, lo_mask = mpnn_restraints.pssm_tensors_from_dict(
        {"A": entry}, LETTERS, LENS, threshold=-1.0
    )
    assert coef.shape == (1, 24) and coef[0, :14].min() == 1.0
    assert coef[0, 14:].max() == 0.0  # chain without entry -> neutral
    # chain A log-odds 0 > -1 -> allowed; default chain B 10000 > -1 too
    assert lo_mask.min() == 1.0
    _, _, strict = mpnn_restraints.pssm_tensors_from_dict(
        {"A": entry}, LETTERS, LENS, threshold=0.5
    )
    assert strict[0, :14].max() == 0.0 and strict[0, 14:].min() == 1.0


def test_tied_positions_from_list_with_betas():
    groups, beta = mpnn_restraints.tied_positions_from_list(
        [{"A": [1], "B": [1]}, {"A": [[3], [0.5]], "B": [[3], [2.0]]}],
        LETTERS, LENS,
    )
    assert groups == ((0, 14), (2, 16))
    assert beta[2] == 0.5 and beta[16] == 2.0 and beta[0] == 1.0


def test_unknown_chain_fails_loud():
    with pytest.raises(ToolUnavailable):
        mpnn_restraints.chain_m_pos_from_dict({"Z": [1]}, LETTERS, LENS)
    with pytest.raises(ToolUnavailable):
        mpnn_restraints.tied_positions_from_list([{"Z": [1]}], LETTERS, LENS)


def test_load_jsonl_last_line_wins_and_plain_json(tmp_path):
    f = tmp_path / "r.jsonl"
    f.write_text('{"A": [1]}\n{"A": [2]}\n')
    assert mpnn_restraints.load_jsonl(f) == {"A": [2]}
    g = tmp_path / "pretty.json"
    g.write_text(json.dumps({"A": [1, 2]}, indent=2))
    assert mpnn_restraints.load_jsonl(g) == {"A": [1, 2]}
    with pytest.raises(ToolUnavailable):
        (tmp_path / "empty.json").write_text("\n")
        mpnn_restraints.load_jsonl(tmp_path / "empty.json")


def test_resolve_name_both_forms():
    inner = {"A": [1]}
    assert mpnn_restraints.resolve_name({"case": inner}, "case") == inner
    assert mpnn_restraints.resolve_name(inner, "case") == inner


# ------------------------------------------------------------- behavioral


def _samples(seqs_dir, name, n):
    fa = (seqs_dir / f"{name}.fa").read_text().splitlines()
    return [fa[3 + 2 * i].replace("/", "") for i in range(n)]


def test_omit_aa_dict_forces_remaining_letter(tmp_path, params):
    """Omitting 19 of 20 letters at A:3 leaves only Y (X is globally
    omitted by the default --omit_AAs) -> every sample has Y there."""
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=4, params=params,
        cfg=CFG, omit_aa_dict={"A": [[[3], "ACDEFGHIKLMNPQRSTVW"]]},
    )
    for seq in _samples(seqs_dir, "case", 4):
        assert seq[2] == "Y"


def test_bias_by_res_dict_dominates(tmp_path, params):
    """A +50 logit bias for W at B:2 wins at sampling temperature 0.1."""
    rows = np.zeros((10, 21))
    rows[1, mpnn.MPNN_ALPHABET.index("W")] = 50.0
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=4, params=params,
        cfg=CFG, bias_by_res_dict={"case": {"B": rows.tolist()}},
    )
    for seq in _samples(seqs_dir, "case", 4):
        assert seq[14 + 1] == "W"


def test_tied_positions_dict_ties_across_chains(tmp_path, params):
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=4, params=params,
        cfg=CFG, sampling_temp=0.8,
        tied_positions=[{"A": [2], "B": [2]}, {"A": [5], "B": [7]}],
    )
    for seq in _samples(seqs_dir, "case", 4):
        assert seq[1] == seq[14 + 1]
        assert seq[4] == seq[14 + 6]


def test_tie_chains_and_tied_positions_conflict(tmp_path, params):
    (tmp_path / "case.pdb").write_text(_two_chain_pdb(12, 12))
    with pytest.raises(ToolUnavailable):
        mpnn_design.design_sequences(
            tmp_path, tmp_path / "sc", params=params, cfg=CFG,
            tie_chains=True, tied_positions=[{"A": [1], "B": [1]}],
        )


def test_pssm_bias_full_mix_forces_pssm_argmax(tmp_path, params):
    """pssm_multi=1 + pssm_bias_flag: probs = pssm_bias exactly
    (protein_mpnn_run.py:291, utils :1147-1156) -> chain A is all H."""
    h = mpnn.MPNN_ALPHABET.index("H")
    bias = np.zeros((14, 21)); bias[:, h] = 1.0
    entry = {
        "pssm_coef": [1.0] * 14,
        "pssm_bias": bias.tolist(),
        "pssm_log_odds": np.full((14, 21), 10.0).tolist(),
    }
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, pssm_dict={"A": entry}, pssm_multi=1.0,
        pssm_bias_flag=True,
    )
    for seq in _samples(seqs_dir, "case", 3):
        assert seq[:14] == "H" * 14


def test_pssm_log_odds_mask_restricts(tmp_path, params):
    """log_odds_flag + threshold: letters below the cutoff are damped to
    a 0.001 leak of their original probability (the reference's soft
    mask, utils :1151-1153 `probs*mask + probs*0.001` — NOT a hard ban).
    At a high temperature (near-flat base probs) the one passing letter
    (K on chain A) must dominate the designs."""
    k = mpnn.MPNN_ALPHABET.index("K")
    lo = np.full((14, 21), -5.0); lo[:, k] = 5.0
    entry = {
        "pssm_coef": [0.0] * 14,
        "pssm_bias": np.zeros((14, 21)).tolist(),
        "pssm_log_odds": lo.tolist(),
    }
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, sampling_temp=3.0, pssm_dict={"A": entry},
        pssm_threshold=0.0, pssm_log_odds_flag=True,
    )
    a_residues = "".join(seq[:14] for seq in _samples(seqs_dir, "case", 3))
    assert a_residues.count("K") / len(a_residues) >= 0.75, a_residues


def test_backbone_noise_runs_and_perturbs(tmp_path, params):
    """--backbone_noise (augment_eps): same seed, noised coords ->
    valid fasta; the design generally differs from the noiseless one."""
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    clean = mpnn_design.design_sequences(
        tmp_path, tmp_path / "c0", num_seq_per_target=2, params=params,
        cfg=CFG,
    )
    noisy = mpnn_design.design_sequences(
        tmp_path, tmp_path / "c1", num_seq_per_target=2, params=params,
        cfg=CFG, backbone_noise=5.0,
    )
    s0 = (clean / "case.fa").read_text().splitlines()
    s1 = (noisy / "case.fa").read_text().splitlines()
    assert len(s0) == len(s1) == 2 * (1 + 2)
    assert s0[1] == s1[1]  # native record unchanged
    assert any(a != b for a, b in zip(s0[2:], s1[2:]))


def test_cli_restraint_flags(tmp_path, params):
    """End-to-end CLI: jsonl files -> flags -> obeyed design."""
    from .test_mpnn_design import _write_npz_weights

    w = tmp_path / "w.npz"
    _write_npz_weights(w)
    pdb = tmp_path / "case.pdb"
    pdb.write_text(_two_chain_pdb())
    omit_f = tmp_path / "omit.jsonl"
    omit_f.write_text(json.dumps(
        {"case": {"A": [[[3], "ACDEFGHIKLMNPQRSTVW"]]}}
    ) + "\n")
    tied_f = tmp_path / "tied.jsonl"
    tied_f.write_text(json.dumps({"case": [{"A": [2], "B": [2]}]}) + "\n")
    out = tmp_path / "out"
    mpnn_design.main([
        "--pdb_dir", str(tmp_path), "--out_folder", str(out),
        "--weights_path", str(w), "--num_seq_per_target", "3",
        "--omit_AA_jsonl", str(omit_f),
        "--tied_positions_jsonl", str(tied_f),
        "--backbone_noise", "0.1",
    ])
    for seq in _samples(out / "seqs", "case", 3):
        assert seq[2] == "Y"
        assert seq[1] == seq[14 + 1]
