"""The flagship BASELINE config 1 as ONE chain (VERDICT r2 item 1).

TCR CDR3 inpainting end-to-end exactly as a user of the reference runs it
(ref experiments/inference.py:244-376 + evaluation/evaluate_tcr.py:505):

    database CSV -> TCRSampler.from_database (download dir + inference
    filters + cached metadata.csv) -> anarci/IMGT CDR3 masks -> batched
    reverse-diffusion sampler -> save_traj filesystem contract ->
    tcr_eval.run producing the reference-schema eval_metrics_{all,
    <strategy>}.csv with finite RMSDs.

Runs with a tiny random-weight model and num_t=2; the point is that the
chain COMPOSES, not the numbers. The pieces are each covered elsewhere
(test_samplers / test_inference / test_eval_cli); this is the one test
that proves they fit together.
"""
import pathlib

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.eval import selection as sel_lib
from framedipt_tpu.eval import tcr_eval
from framedipt_tpu.experiments.inference import Inference
from framedipt_tpu.experiments.samplers import TCRSampler

from tests.integration.test_inference import CIF_DIR, tiny_inference_cfg

SAMPLES = 2


@pytest.fixture(scope="module")
def flagship_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("flagship")

    # The database-driven flow expects download_dir/cifs; pre-seed it with
    # the checked-in 1fyt assembly (a TCR-pMHC class II complex) so the
    # zero-egress environment skips the RCSB fetch.
    download_dir = tmp_path / "download"
    cifs_dir = download_dir / "cifs"
    cifs_dir.mkdir(parents=True)
    (cifs_dir / "1fyt-assembly1.cif").write_bytes(
        (CIF_DIR / "1fyt-assembly1.cif").read_bytes()
    )

    # One-row database CSV: the 1fyt chain roles from database/TCR_pMHC_II.csv.
    csv_path = tmp_path / "TCR.csv"
    csv_path.write_text(
        "pdb_id,tcr_alpha_chain,tcr_beta_chain,"
        "mhc_alpha_chain,mhc_beta_chain,peptide_chain\n"
        "1fyt,D,E,A,B,C\n"
    )

    cfg = tiny_inference_cfg(tmp_path)
    isc = cfg.inference.inpainting_samples
    isc.tcr = True
    isc.batch_samples = True
    isc.samples = SAMPLES
    isc.cdr_loops = ["beta_3"]
    isc.data_path = str(csv_path)
    isc.download_dir = str(download_dir)
    cfg.inference.name = "flagship"

    # cif_dir=None routes through TCRSampler.from_database.
    inference = Inference(cfg)
    inference.run_sampling()
    return inference, download_dir


def test_database_driven_sampler(flagship_run):
    inference, download_dir = flagship_run
    assert isinstance(inference.sampler, TCRSampler)
    assert len(inference.sampler) == SAMPLES  # 1 structure x SAMPLES

    # The filter pass cached its metadata next to the downloads.
    metadata = pd.read_csv(download_dir / "processed" / "metadata.csv")
    assert "1fyt" in set(metadata["pdb_name"].astype(str))


def test_filesystem_contract(flagship_run):
    inference, _ = flagship_run
    out = inference.output_dir
    length_dirs = list(out.glob("1fyt_length_*"))
    assert len(length_dirs) == 1, f"expected one length dir, got {length_dirs}"
    ldir = length_dirs[0]

    # CDR3-beta is 5-17 residues under IMGT numbering; the b-factor=100
    # markers in the ground truth PDB delimit the diffused loop.
    from framedipt_tpu.data.protein import from_pdb_string

    gt = from_pdb_string((ldir / "1fyt_1.pdb").read_text())
    marked = gt.b_factors.max(axis=-1) == 100.0
    assert 3 <= marked.sum() <= 25

    info = pd.read_csv(ldir / "diffusion_info.csv", sep="\t")
    assert list(info.columns) == ["pdb_name", "seq", "chain", "start", "end"]

    for s in range(SAMPLES):
        sample_pdb = ldir / f"sample_{s}" / f"sample_{s}_1.pdb"
        assert sample_pdb.exists()
        prot = from_pdb_string(sample_pdb.read_text())
        assert np.isfinite(prot.atom_positions).all()


def test_tcr_eval_reference_schema(flagship_run):
    inference, _ = flagship_run
    df = tcr_eval.run(inference.output_dir)

    # eval_metrics_all.csv + one per selection strategy, reference naming
    # (ref evaluation/evaluate_tcr.py:281-370 output contract).
    eval_dir = inference.output_dir
    all_csv = list(eval_dir.rglob("eval_metrics_all.csv"))
    assert all_csv, "eval_metrics_all.csv missing"
    for strategy in sel_lib.SAMPLE_SELECTION_STRATEGIES:
        assert list(eval_dir.rglob(f"eval_metrics_{strategy}.csv")), strategy

    assert len(df) == SAMPLES
    assert set(df["pdb_name"]) == {"1fyt"}
    assert np.isfinite(df["backbone_rmsd"].to_numpy(np.float64)).all()
    assert (df["backbone_rmsd"] > 0).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
