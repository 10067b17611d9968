"""In-process MPNN design runner: PDB -> reference-format fasta.

Output contract: protein_mpnn_run.py:349-368 (native record first, then
``>T=..., sample=n, score=..., global_score=..., seq_recovery=...`` per
sample; '/' joins chains)."""
from __future__ import annotations

import numpy as np
import pytest

from framedipt_tpu.data.protein import Protein, to_pdb
from framedipt_tpu.model import mpnn
from framedipt_tpu.tools import mpnn_design
from framedipt_tpu.tools.external import ToolUnavailable

from .geom_helpers import nerf_backbone

CFG = mpnn.MPNNConfig(k_neighbors=12)


def _two_chain_pdb(n1=14, n2=10) -> str:
    n = n1 + n2
    atom37, mask = nerf_backbone(n)
    atom37 = atom37.copy()
    atom37[n1:] += np.array([25.0, 0.0, 0.0])  # separate the chains
    return to_pdb(
        Protein(
            atom_positions=atom37,
            atom_mask=mask,
            aatype=np.arange(n) % 20,
            residue_index=np.concatenate(
                [np.arange(1, n1 + 1), np.arange(1, n2 + 1)]
            ),
            chain_index=np.concatenate(
                [np.zeros(n1, np.int32), np.ones(n2, np.int32)]
            ),
            b_factors=np.zeros((n, 37)),
        )
    )


@pytest.fixture(scope="module")
def params():
    import jax

    return mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)


def test_design_sequences_fasta_contract(tmp_path, params):
    (tmp_path / "sample_0.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG,
    )
    fa = (seqs_dir / "sample_0.fa").read_text().splitlines()
    assert len(fa) == 2 * (1 + 3)
    assert fa[0].startswith(">sample_0, score=")
    assert "designed_chains=['A', 'B']" in fa[0]
    native = fa[1]
    assert native.count("/") == 1
    a, b = native.split("/")
    assert (len(a), len(b)) == (14, 10)
    for i in range(3):
        hdr, seq = fa[2 + 2 * i], fa[3 + 2 * i]
        assert hdr.startswith(f">T=0.1, sample={i + 1}, score=")
        assert "seq_recovery=" in hdr
        assert len(seq) == len(native)
        # omit_AAs default: X never designed
        assert "X" not in seq.replace("/", "")


def test_design_sequences_no_pdbs_raises(tmp_path, params):
    with pytest.raises(ToolUnavailable):
        mpnn_design.design_sequences(
            tmp_path, tmp_path / "sc", params=params, cfg=CFG
        )


def test_load_params_npz_roundtrip(tmp_path):
    """Converted-.npz load path: flat state_dict names + num_edges."""
    from tests.parity.fixture_lib import synth_value

    data = np.load("tests/parity/fixtures/recorded_mpnn_parity.npz")
    names = [str(n) for n in data["manifest_names"]]
    shapes = [
        tuple(int(x) for x in s.split(",")) for s in data["manifest_shapes"]
    ]
    flat = {n: synth_value(n, s, seed=int(data["seed"]))
            for n, s in zip(names, shapes)}
    np.savez(tmp_path / "w.npz", num_edges=np.int64(48), **flat)
    params, cfg = mpnn_design.load_mpnn_params(tmp_path / "w.npz")
    assert cfg.k_neighbors == 48
    assert params["W_s"].shape == (21, 128)
    assert len(params["encoder"]) == 3


def test_load_params_missing_raises(tmp_path):
    with pytest.raises(ToolUnavailable):
        mpnn_design.load_mpnn_params(tmp_path / "nope.pt")


def test_convert_pt_checkpoint_roundtrip(tmp_path):
    """scripts/convert_mpnn_weights.py: .pt -> .npz -> load_mpnn_params,
    and the direct .pt load path, yield identical params."""
    import sys

    import torch

    sys.path.insert(0, "scripts")
    from convert_mpnn_weights import convert

    from tests.parity.fixture_lib import synth_value

    data = np.load("tests/parity/fixtures/recorded_mpnn_parity.npz")
    names = [str(n) for n in data["manifest_names"]]
    shapes = [
        tuple(int(x) for x in s.split(",")) for s in data["manifest_shapes"]
    ]
    sd = {
        n: torch.from_numpy(synth_value(n, s, seed=int(data["seed"])))
        for n, s in zip(names, shapes)
    }
    pt = tmp_path / "w.pt"
    torch.save({"model_state_dict": sd, "num_edges": 48}, pt)
    convert(pt, tmp_path / "w.npz")

    p_pt, cfg_pt = mpnn_design.load_mpnn_params(pt)
    p_npz, cfg_npz = mpnn_design.load_mpnn_params(tmp_path / "w.npz")
    assert cfg_pt == cfg_npz
    assert not cfg_pt.ca_only and cfg_pt.k_neighbors == 48
    import jax

    flat_a = jax.tree_util.tree_leaves(p_pt)
    flat_b = jax.tree_util.tree_leaves(p_npz)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_omit_and_bias_plumbing(tmp_path, params):
    """--omit_AAs beyond the default and a large +bias must shape the
    samples: omit 'C' -> no cysteines; bias A by +25 -> nearly all A."""
    (tmp_path / "sample_0.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=4, params=params,
        cfg=CFG, omit_aas="XC", bias_aa={"A": 25.0},
    )
    fa = (seqs_dir / "sample_0.fa").read_text().splitlines()
    designed = "".join(fa[3::2]).replace("/", "")
    assert "C" not in designed and "X" not in designed
    assert designed.count("A") / len(designed) > 0.95


def _write_npz_weights(path):
    from tests.parity.fixture_lib import synth_value

    data = np.load("tests/parity/fixtures/recorded_mpnn_parity.npz")
    names = [str(n) for n in data["manifest_names"]]
    shapes = [
        tuple(int(x) for x in s.split(",")) for s in data["manifest_shapes"]
    ]
    flat = {n: synth_value(n, s, seed=int(data["seed"]))
            for n, s in zip(names, shapes)}
    np.savez(path, num_edges=np.int64(48), **flat)


def test_cli_design_and_score(tmp_path):
    """main() mirrors protein_mpnn_run.py's surface: --pdb_dir design run
    writes seqs/, --pdb_path --score_only writes score_only/."""
    _write_npz_weights(tmp_path / "w.npz")
    pdb_dir = tmp_path / "in"
    pdb_dir.mkdir()
    (pdb_dir / "case.pdb").write_text(_two_chain_pdb())
    mpnn_design.main([
        "--pdb_dir", str(pdb_dir), "--out_folder", str(tmp_path / "o1"),
        "--weights_path", str(tmp_path / "w.npz"),
        "--num_seq_per_target", "2", "--omit_AAs", "XW",
    ])
    fa = (tmp_path / "o1" / "seqs" / "case.fa").read_text().splitlines()
    assert len(fa) == 2 * (1 + 2)
    assert "W" not in "".join(fa[3::2])

    mpnn_design.main([
        "--pdb_path", str(pdb_dir / "case.pdb"),
        "--out_folder", str(tmp_path / "o2"),
        "--weights_path", str(tmp_path / "w.npz"),
        "--num_seq_per_target", "3", "--score_only",
    ])
    data = np.load(tmp_path / "o2" / "score_only" / "case.npz")
    assert data["score"].shape == (3,)


def test_cli_requires_exactly_one_input(tmp_path):
    with pytest.raises(SystemExit):
        mpnn_design.main(["--out_folder", str(tmp_path)])


def test_probs_backbones_contracts(tmp_path, params):
    """--unconditional_probs_only / --conditional_probs_only npz contract
    (protein_mpnn_run.py:241-263): log_p [R,L,21], S/mask/design_mask [L];
    conditional zero-fills non-designed rows, unconditional does not."""
    (tmp_path / "sample_0.pdb").write_text(_two_chain_pdb())
    out_u = mpnn_design.probs_backbones(
        tmp_path, tmp_path / "sc", conditional=False, params=params, cfg=CFG
    )
    d = np.load(out_u / "sample_0.npz")
    assert d["log_p"].shape == (1, 24, 21)
    assert d["S"].shape == (24,) and d["design_mask"].shape == (24,)
    # rows are log-softmax: logsumexp == 0 for valid positions
    lse = np.log(np.exp(d["log_p"][0]).sum(-1))
    assert np.allclose(lse[d["mask"] > 0], 0.0, atol=1e-4)

    out_c = mpnn_design.probs_backbones(
        tmp_path, tmp_path / "sc", conditional=True, num_repeats=2,
        params=params, cfg=CFG,
    )
    d = np.load(out_c / "sample_0.npz")
    assert d["log_p"].shape == (2, 24, 21)
    assert np.all(d["log_p"][:, d["design_mask"] == 0, :] == 0.0)
    # different decoding-order randn per repeat -> different rows
    assert not np.array_equal(d["log_p"][0], d["log_p"][1])


def test_tie_chains_designs_homomers(tmp_path, params):
    """--tie_chains: residue i is identical across chains in every sample
    (tied_sample, utils :1171-1267; homomer tie pattern of
    make_tied_positions_dict.py)."""
    (tmp_path / "dimer.pdb").write_text(_two_chain_pdb(12, 12))
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, tie_chains=True, sampling_temp=0.5,
    )
    fa = (seqs_dir / "dimer.fa").read_text().splitlines()
    for i in range(3):
        a, b = fa[3 + 2 * i].split("/")
        assert a == b, f"sample {i + 1} chains differ: {a} vs {b}"


def test_homomer_tied_positions_uneven():
    groups = mpnn_design.homomer_tied_positions([5, 3])
    assert groups == ((0, 5), (1, 6), (2, 7))


def test_design_chains_keeps_fixed_chain_native(tmp_path, params):
    """design_chains=['B']: chain A must come back as the native sequence
    in every sample; header lists the designed/fixed split
    (the --chain_id_jsonl contract)."""
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, design_chains=["B"],
    )
    fa = (seqs_dir / "case.fa").read_text().splitlines()
    assert "fixed_chains=['A']" in fa[0]
    assert "designed_chains=['B']" in fa[0]
    native_a = fa[1].split("/")[0]
    for i in range(3):
        a, b = fa[3 + 2 * i].split("/")
        assert a == native_a, "fixed chain A was redesigned"
    # and asking for a chain that doesn't exist fails loud
    with pytest.raises(ToolUnavailable):
        mpnn_design.design_sequences(
            tmp_path, tmp_path / "sc2", params=params, cfg=CFG,
            design_chains=["Z"],
        )


def test_chain_id_dict_per_pdb_split(tmp_path, params):
    """chain_id_dict {name: [designed, fixed]} — the --chain_id_jsonl
    contract (assign_fixed_chains.py output, protein_mpnn_run.py:60-68).
    Per-name it must match the equivalent global design_chains run, take
    precedence over design_chains, and error loud on a missing name (the
    reference KeyErrors in tied_featurize, protein_mpnn_utils.py:199)."""
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    via_dict = mpnn_design.design_sequences(
        tmp_path, tmp_path / "d1", num_seq_per_target=2, params=params,
        cfg=CFG, chain_id_dict={"case": [["B"], ["A"]]},
        # design_chains says A, the per-PDB dict must win
        design_chains=["A"],
    )
    via_global = mpnn_design.design_sequences(
        tmp_path, tmp_path / "d2", num_seq_per_target=2, params=params,
        cfg=CFG, design_chains=["B"],
    )
    fa1 = (via_dict / "case.fa").read_text()
    assert fa1 == (via_global / "case.fa").read_text()
    assert "designed_chains=['B']" in fa1
    with pytest.raises(ToolUnavailable, match="missing from chain_id_dict"):
        mpnn_design.design_sequences(
            tmp_path, tmp_path / "d3", params=params, cfg=CFG,
            chain_id_dict={"other": [["A"], []]},
        )


def test_fixed_positions_keep_native(tmp_path, params):
    """fixed_positions {chain: [1-based pos]} keep those residues native
    in every sample (the --fixed_positions_jsonl contract)."""
    (tmp_path / "case.pdb").write_text(_two_chain_pdb())
    seqs_dir = mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, fixed_positions={"A": [1, 5], "B": [2]},
    )
    fa = (seqs_dir / "case.fa").read_text().splitlines()
    na, nb = fa[1].split("/")
    for i in range(3):
        a, b = fa[3 + 2 * i].split("/")
        assert a[0] == na[0] and a[4] == na[4]
        assert b[1] == nb[1]
    with pytest.raises(ToolUnavailable):
        mpnn_design.design_sequences(
            tmp_path, tmp_path / "sc2", params=params, cfg=CFG,
            fixed_positions={"Z": [1]},
        )


def test_design_save_score_and_probs(tmp_path, params):
    """--save_score / --save_probs sidecar npz files
    (protein_mpnn_run.py:369-374)."""
    (tmp_path / "sample_0.pdb").write_text(_two_chain_pdb())
    mpnn_design.design_sequences(
        tmp_path, tmp_path / "sc", num_seq_per_target=3, params=params,
        cfg=CFG, save_score=True, save_probs=True,
    )
    sc = np.load(tmp_path / "sc" / "scores" / "sample_0.npz")
    assert sc["score"].shape == (3,) and np.isfinite(sc["score"]).all()
    pr = np.load(tmp_path / "sc" / "probs" / "sample_0.npz")
    assert pr["probs"].shape == (3, 24, 21)
    assert pr["log_probs"].shape == (3, 24, 21)
    assert pr["S"].shape == (3, 24)
    assert list(pr["chain_order"]) == ["A", "B"]


def test_score_backbones_npz_contract(tmp_path, params):
    """--score_only mode (protein_mpnn_run.py:222-252): per-PDB npz with
    score/global_score arrays; masked-region score >= global when the
    designed region is the whole protein is NOT required, but both must be
    finite and the right shape."""
    (tmp_path / "sample_0.pdb").write_text(_two_chain_pdb())
    out = mpnn_design.score_backbones(
        tmp_path, tmp_path / "sc", num_scores=4, params=params, cfg=CFG
    )
    data = np.load(out / "sample_0.npz")
    assert data["score"].shape == (4,)
    assert data["global_score"].shape == (4,)
    assert np.isfinite(data["score"]).all()
    assert np.isfinite(data["global_score"]).all()


def test_load_params_infers_custom_dims(tmp_path):
    """Checkpoints from the training CLI with non-default dims must load
    at THEIR architecture, not the published 128/3/3 defaults (config is
    read from the weights: hidden from edge_embedding rows, layer counts
    from the state-dict key set)."""
    import jax

    from framedipt_tpu.experiments.train_mpnn import save_npz_checkpoint
    from framedipt_tpu.model import mpnn

    cfg = mpnn.MPNNConfig(
        hidden_dim=32, num_encoder_layers=1, num_decoder_layers=2,
        k_neighbors=8,
    )
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(0), cfg)
    save_npz_checkpoint(tmp_path / "w.npz", params, cfg)
    loaded, got = mpnn_design.load_mpnn_params(tmp_path / "w.npz")
    assert got.hidden_dim == 32
    assert got.num_encoder_layers == 1
    assert got.num_decoder_layers == 2
    assert got.k_neighbors == 8
    assert not got.ca_only
    assert loaded["W_s"].shape == (21, 32)
    assert len(loaded["encoder"]) == 1 and len(loaded["decoder"]) == 2
