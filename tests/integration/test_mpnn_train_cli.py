"""MPNN training CLI end-to-end on fixture-derived structures.

Contract mirrored from the reference's vendored training script
(ProteinMPNN/training/training.py): train over real parsed structures,
periodic noise-free validation, checkpoints a runner can consume. Here
the checkpoint is the ``.npz`` state-dict format shared with converted
reference weights, so the trained model plugs into the in-process
designer (tools/mpnn_design.py).
"""
import json
import pathlib

import numpy as np
import pytest

from framedipt_tpu.data.pipeline import ProcessOptions, process_serially
from framedipt_tpu.tools.config import FilteringConfig

CIF_DIR = pathlib.Path(__file__).resolve().parents[1] / "data" / "cifs"


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    out = tmp_path_factory.mktemp("processed_mpnn")
    opts = ProcessOptions(
        output_dir=out,
        filtering=FilteringConfig(max_len=2000, min_len=10, chain_max_len=2000),
    )
    rows = process_serially(sorted(CIF_DIR.glob("*.cif")), opts)
    assert len(rows) == 3
    import pandas as pd

    pd.DataFrame(rows).to_csv(out / "metadata.csv", index=False)
    return out


def test_train_mpnn_cli_end_to_end(preprocessed, tmp_path):
    from framedipt_tpu.experiments import train_mpnn
    from framedipt_tpu.tools.mpnn_design import load_mpnn_params

    out = tmp_path / "run"
    train_mpnn.main([
        "--csv_path", str(preprocessed / "metadata.csv"),
        "--output_dir", str(out),
        "--num_steps", "10",
        "--batch_size", "2",
        "--max_length", "96",
        "--hidden_dim", "32",
        "--num_layers", "1",
        "--k_neighbors", "8",
        "--log_freq", "2",
        "--eval_freq", "5",
        "--ckpt_freq", "5",
    ])

    rows = [
        json.loads(line)
        for line in (out / "metrics.jsonl").read_text().splitlines()
    ]
    train_rows = [r for r in rows if "loss" in r]
    eval_rows = [r for r in rows if "eval_nll" in r]
    assert train_rows and eval_rows
    for r in train_rows:
        assert np.isfinite(r["loss"]) and np.isfinite(r["nll"])
    for r in eval_rows:
        assert np.isfinite(r["eval_nll"])
        assert 0.0 <= r["eval_accuracy"] <= 1.0

    # The checkpoint loads through the SAME path as converted reference
    # weights and drives the in-process designer.
    assert (out / "step_5.npz").exists()
    params, cfg = load_mpnn_params(out / "last.npz")
    assert cfg.k_neighbors == 8 and not cfg.ca_only
    assert len(params["encoder"]) == 1
    assert params["W_out"]["w"].shape == (32, 21)


def test_structure_to_mpnn_features_multichain(preprocessed):
    """Pipeline pickle -> MPNN features: chain encodings 1-based, 100-gap
    residue_idx between chains, missing residues masked out."""
    import pickle

    import pandas as pd

    from framedipt_tpu.experiments.train_mpnn import structure_to_mpnn_features

    meta = pd.read_csv(preprocessed / "metadata.csv")
    with open(meta.iloc[0]["processed_path"], "rb") as f:
        raw = pickle.load(f)
    feats = structure_to_mpnn_features(raw)
    n_chains = len(np.unique(raw["chain_index"]))
    assert feats["X"].shape == (1, len(raw["aatype"]), 4, 3)
    enc = feats["chain_encoding_all"][0]
    assert enc.min() == 1 and enc.max() == n_chains
    if n_chains > 1:
        boundaries = np.where(np.diff(enc) != 0)[0]
        ri = feats["residue_idx"][0]
        assert (np.diff(ri)[boundaries] >= 100).all()
    # Missing residues (bb_mask 0) are masked.
    assert feats["mask"].sum() <= len(raw["aatype"])
    assert np.isfinite(feats["X"]).all()
