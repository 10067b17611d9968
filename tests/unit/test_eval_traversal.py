"""Prediction-dir traversal parity: all_atom preference, legacy layout,
and the directory reindex mode.

Reference: evaluation/utils/directory_parser.py (sample_file_parser +
traverse_prediction_dir) and evaluation/residue_reindex.py:128-171.
"""
import pathlib
import shutil

import numpy as np

from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.eval import tcr_eval
from framedipt_tpu.eval.residue_reindex import reindex_prediction_dir
from tests.unit.test_eval_cli import make_fake_run


def _length_dir(run_dir: pathlib.Path) -> pathlib.Path:
    return next(run_dir.glob("*_length_*"))


def test_traversal_prefers_all_atom(tmp_path):
    run_dir = make_fake_run(tmp_path)
    ldir = _length_dir(run_dir)
    # cg2all writes sample_{i}_1_all_atom.pdb next to the backbone pdb;
    # the reference's sample_file_parser picks it when present (:27-32).
    src = ldir / "sample_1" / "sample_1_1.pdb"
    shutil.copyfile(src, ldir / "sample_1" / "sample_1_1_all_atom.pdb")

    entries = list(tcr_eval.traverse_prediction_dir(run_dir))
    assert len(entries) == 1
    _, _, _, samples = entries[0]
    names = [p.name for p in samples]
    assert "sample_1_1_all_atom.pdb" in names
    assert "sample_1_1.pdb" not in names
    assert "sample_0_1.pdb" in names and "sample_2_1.pdb" in names


def test_traversal_legacy_layout(tmp_path):
    run_dir = make_fake_run(tmp_path)
    ldir = _length_dir(run_dir)
    # Legacy layout: gt pdb + diffusion_info.csv under sample_0/
    # (ref directory_parser.py:66-70).
    shutil.move(str(ldir / "test_1.pdb"), str(ldir / "sample_0" / "test_1.pdb"))
    shutil.move(
        str(ldir / "diffusion_info.csv"),
        str(ldir / "sample_0" / "diffusion_info.csv"),
    )
    assert not list(tcr_eval.traverse_prediction_dir(run_dir))
    entries = list(
        tcr_eval.traverse_prediction_dir(run_dir, legacy_file_structure=True)
    )
    assert len(entries) == 1
    _, gt_path, info, samples = entries[0]
    assert gt_path.parent.name == "sample_0"
    assert info["pdb_name"] == "test"
    assert len(samples) == 3


def test_row_attribution_survives_missing_sample(tmp_path):
    """Rows must carry the sample's OWN directory index, not its enumerate
    position: a partially resumed run missing sample_0 would otherwise
    shift every later sample's metrics onto the wrong index
    (tcr_eval.sample_index)."""
    run_dir = make_fake_run(tmp_path)
    ldir = _length_dir(run_dir)
    shutil.rmtree(ldir / "sample_0")

    df = tcr_eval.run(run_dir, make_plots=False)
    assert sorted(df["sample_idx"].tolist()) == [1, 2]
    # Known synthetic errors (x-shift of 2*(s+1)/3 over the region): the
    # rows must pair each index with ITS shift, not sample_0/1's.
    by_idx = df.set_index("sample_idx")["backbone_rmsd"]
    np.testing.assert_allclose(by_idx.loc[1], 4.0 / 3, atol=2e-3)
    np.testing.assert_allclose(by_idx.loc[2], 2.0, atol=2e-3)
    # Strategy CSVs' selected_sample uses the same directory-index scheme:
    # with samples {1,2} no strategy may claim the deleted sample_0.
    import pandas as pd

    for strategy in ("mean_closest", "median_closest"):
        sdf = pd.read_csv(
            run_dir / "evaluation" / f"eval_metrics_{strategy}.csv"
        )
        assert int(sdf.iloc[0]["selected_sample"]) in (1, 2)


def test_reindex_prediction_dir(tmp_path):
    run_dir = make_fake_run(tmp_path / "in")
    ldir = _length_dir(run_dir)
    # Author-style numbering: offset residue indices in the gt pdb so the
    # reindex has something to normalize.
    gt = ldir / "test_1.pdb"
    text = gt.read_text().replace("A   1", "A  40")  # crude but valid shift
    gt.write_text(text)

    out_dir = tmp_path / "out"
    n = reindex_prediction_dir(run_dir, out_dir)
    assert n == 1

    out_ldir = out_dir / ldir.name
    assert (out_ldir / "diffusion_info.csv").exists()
    for rel in ("test_1.pdb", "sample_0/sample_0_1.pdb",
                "sample_1/sample_1_1.pdb", "sample_2/sample_2_1.pdb"):
        out_pdb = out_ldir / rel
        assert out_pdb.exists(), rel
        prot = from_pdb_string(out_pdb.read_text())
        np.testing.assert_array_equal(
            prot.residue_index, np.arange(1, len(prot.aatype) + 1)
        )
