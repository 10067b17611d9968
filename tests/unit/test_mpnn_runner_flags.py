"""Remaining protein_mpnn_run.py surface: multi-temperature sampling,
batch_size chunking, max_length filter, --pdb_path_chains alias,
--path_to_model_weights/--model_name resolution, --ca_only assertion,
seed=0 randomization (protein_mpnn_run.py:47-54,116,287-367,384-409).
"""
from __future__ import annotations

import numpy as np
import pytest

from framedipt_tpu.model import mpnn
from framedipt_tpu.tools import mpnn_design
from framedipt_tpu.tools.external import ToolUnavailable

from .test_mpnn_design import CFG, _two_chain_pdb, _write_npz_weights


@pytest.fixture(scope="module")
def params():
    import jax

    return mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture()
def pdb_dir(tmp_path):
    d = tmp_path / "pdbs"
    d.mkdir()
    (d / "case.pdb").write_text(_two_chain_pdb())
    return d


def _headers(fa_path):
    return [ln for ln in fa_path.read_text().splitlines()
            if ln.startswith(">")]


def test_multi_temperature_string(pdb_dir, tmp_path, params):
    """'0.1 0.5' generates num_seq per temperature, sample numbering
    restarting per temperature (run.py:287,366-367)."""
    seqs = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o", num_seq_per_target=2,
        sampling_temp="0.1 0.5", params=params, cfg=CFG,
        save_score=True,
    )
    heads = _headers(seqs / "case.fa")
    assert len(heads) == 1 + 4  # native + 2 temps x 2 samples
    assert [h.split(",")[0] for h in heads[1:]] == [
        ">T=0.1", ">T=0.1", ">T=0.5", ">T=0.5",
    ]
    assert [h.split("sample=")[1].split(",")[0] for h in heads[1:]] == [
        "1", "2", "1", "2",
    ]
    # sidecar concatenates across temperatures
    sc = np.load(tmp_path / "o" / "scores" / "case.npz")
    assert sc["score"].shape == (4,)


def test_multi_temp_first_batch_matches_single_temp(
    pdb_dir, tmp_path, params
):
    """The first temperature's samples reuse the single-temp key, so
    adding temperatures only APPENDS to the fasta."""
    one = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "one", num_seq_per_target=2,
        sampling_temp=0.1, params=params, cfg=CFG,
    )
    two = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "two", num_seq_per_target=2,
        sampling_temp="0.1 0.3", params=params, cfg=CFG,
    )
    lines_one = (one / "case.fa").read_text().splitlines()
    lines_two = (two / "case.fa").read_text().splitlines()
    assert lines_two[: len(lines_one)] == lines_one


def test_batch_size_chunking(pdb_dir, tmp_path, params):
    """batch_size=2 with num_seq=5 -> reference floor division: 4
    sequences, numbered 1..4 (run.py:52); batch > num_seq fails loud."""
    seqs = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o", num_seq_per_target=5, batch_size=2,
        params=params, cfg=CFG,
    )
    heads = _headers(seqs / "case.fa")
    assert len(heads) == 1 + 4
    assert [h.split("sample=")[1].split(",")[0] for h in heads[1:]] == [
        "1", "2", "3", "4",
    ]
    with pytest.raises(ToolUnavailable):
        mpnn_design.design_sequences(
            pdb_dir, tmp_path / "o2", num_seq_per_target=1, batch_size=4,
            params=params, cfg=CFG,
        )


def test_max_length_filter(pdb_dir, tmp_path, params):
    """Structures longer than max_length are skipped (the runner's
    StructureDataset max_length filter)."""
    seqs = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o", num_seq_per_target=1, max_length=10,
        params=params, cfg=CFG,
    )
    assert not list(seqs.glob("*.fa"))
    seqs = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o2", num_seq_per_target=1, max_length=24,
        params=params, cfg=CFG,
    )
    assert (seqs / "case.fa").exists()


def test_model_name_in_header(pdb_dir, tmp_path, params):
    seqs = mpnn_design.design_sequences(
        pdb_dir, tmp_path / "o", num_seq_per_target=1,
        params=params, cfg=CFG, model_name="v_48_002",
    )
    assert "model_name=v_48_002" in _headers(seqs / "case.fa")[0]


def test_cli_pdb_path_chains_and_weights_folder(tmp_path):
    """--pdb_path_chains restricts design like --design_chains; weights
    resolve from --path_to_model_weights/{model_name}; --ca_only on a
    full-backbone checkpoint fails loud."""
    wdir = tmp_path / "weights"
    wdir.mkdir()
    _write_npz_weights(wdir / "v_48_002.npz")
    pdb = tmp_path / "case.pdb"
    pdb.write_text(_two_chain_pdb())
    out = tmp_path / "out"
    mpnn_design.main([
        "--pdb_path", str(pdb), "--pdb_path_chains", "B",
        "--out_folder", str(out),
        "--path_to_model_weights", str(wdir), "--model_name", "v_48_002",
        "--num_seq_per_target", "1",
    ])
    head, native = (out / "seqs" / "case.fa").read_text().splitlines()[:2]
    assert "designed_chains=['B']" in head and "fixed_chains=['A']" in head
    assert "model_name=v_48_002" in head
    # chain A stays native
    assert native.split("/")[0] == "ARNDCQEGHILKMF"
    with pytest.raises(ToolUnavailable):
        mpnn_design.main([
            "--pdb_path", str(pdb), "--out_folder", str(out),
            "--path_to_model_weights", str(wdir),
            "--model_name", "v_48_002", "--ca_only",
        ])
    with pytest.raises(ToolUnavailable):
        mpnn_design.main([
            "--pdb_path", str(pdb), "--out_folder", str(out),
            "--path_to_model_weights", str(wdir), "--model_name", "nope",
        ])


def test_cli_multi_temp_and_seed_zero(tmp_path):
    w = tmp_path / "w.npz"
    _write_npz_weights(w)
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    (pdb_dir / "case.pdb").write_text(_two_chain_pdb())
    out = tmp_path / "out"
    mpnn_design.main([
        "--pdb_dir", str(pdb_dir), "--out_folder", str(out),
        "--weights_path", str(w), "--num_seq_per_target", "1",
        "--sampling_temp", "0.1 0.2", "--seed", "0",
    ])
    heads = _headers(out / "seqs" / "case.fa")
    assert len(heads) == 3
    seed = int(heads[0].rsplit("seed=", 1)[1])
    assert 1 <= seed <= 999
