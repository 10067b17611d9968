"""TCR evaluation CLI round-trip on synthetic outputs with known errors."""
import pathlib

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.analysis.utils import write_prot_to_pdb
from framedipt_tpu.data import constants as rc
from framedipt_tpu.eval import tcr_eval
from framedipt_tpu.experiments.utils import save_diffusion_info
from tests.unit.geom_helpers import nerf_backbone


def make_fake_run(tmp_path: pathlib.Path, n=30, region=(10, 19), shift=2.0):
    atom37, mask = nerf_backbone(n)
    aatype = np.zeros(n, np.int64)
    chain_index = np.zeros(n, np.int64)
    residue_index = np.arange(1, n + 1)
    diffused = np.zeros(n)
    diffused[region[0] : region[1] + 1] = 1

    length_dir = tmp_path / f"test_length_{int(diffused.sum())}"
    length_dir.mkdir(parents=True)
    b = np.tile((diffused * 100.0)[:, None], (1, 37))
    write_prot_to_pdb(
        atom37 * mask[..., None], length_dir / "test", aatype=aatype,
        b_factors=b, residue_index=residue_index, chain_index=chain_index,
    )
    save_diffusion_info(
        length_dir, "test", rc.aatype_to_sequence(aatype), diffused, chain_index
    )
    # Three samples: GT shifted by +shift in x over the region only.
    for s in range(3):
        sample_dir = length_dir / f"sample_{s}"
        sample_dir.mkdir()
        pos = atom37.copy()
        pos[region[0] : region[1] + 1, :, 0] += shift * (s + 1) / 3.0
        write_prot_to_pdb(
            pos * mask[..., None], sample_dir / f"sample_{s}", aatype=aatype,
            b_factors=b, residue_index=residue_index, chain_index=chain_index,
        )
    return tmp_path


def test_tcr_eval_roundtrip(tmp_path):
    run_dir = make_fake_run(tmp_path)
    df = tcr_eval.run(run_dir, make_plots=False)
    assert len(df) == 3
    # Known per-sample backbone RMSD: uniform x-shift of the region.
    expected = [2.0 / 3, 4.0 / 3, 2.0]
    got = sorted(df["backbone_rmsd"].tolist())
    np.testing.assert_allclose(got, expected, atol=2e-3)
    # Uniform translation leaves interior dihedrals unchanged (small
    # residual from region-boundary dihedrals that mix shifted and
    # unshifted atoms, plus PDB 3-decimal coordinate rounding).
    assert df["psi_error_deg"].max() < 5.0

    out = run_dir / "evaluation"
    for strategy in ("mean", "median", "mode", "mean_closest", "median_closest"):
        path = out / f"eval_metrics_{strategy}.csv"
        assert path.exists(), strategy
        sdf = pd.read_csv(path)
        assert len(sdf) == 1
        # Representatives sit within the sample spread.
        assert 0.5 < sdf.iloc[0]["backbone_rmsd"] < 2.1


def test_reference_schema_columns(tmp_path):
    """eval_metrics_all.csv reproduces the reference's column schema
    (evaluation/evaluate_tcr.py:98-133,443-456 naming + granularities)."""
    run_dir = make_fake_run(tmp_path)
    df = tcr_eval.run(run_dir, make_plots=False, with_sasa=True)

    # Base columns.
    for col in (
        "pdb_name", "structure_length", "sample_idx",
        "tcr_alpha_chain", "tcr_alpha_chain_start_idx",
        "tcr_alpha_chain_end_idx", "tcr_alpha_chain_diffused_length",
    ):
        assert col in df.columns, col
    assert df.iloc[0]["tcr_alpha_chain_diffused_length"] == 10

    # Model / chain granularity.
    assert "bb_rmsd" in df.columns
    assert "bb_rmsd_alpha" in df.columns
    np.testing.assert_allclose(df["bb_rmsd"], df["backbone_rmsd"], atol=1e-9)

    # Residue granularity with eval indices {1..L-4, -4..-1}.
    for idx in (1, 2, 6, -4, -1):
        assert f"bb_rmsd_alpha_{idx}" in df.columns, idx
    assert "bb_rmsd_alpha_7" not in df.columns  # L=10 -> head stops at 6

    # ASA / RSA residue metrics.
    for name in ("gt_asa", "sample_asa", "asa_abs_error", "rsa_square_error"):
        assert f"{name}_alpha_1" in df.columns, name
    # abs error consistency at one position.
    got = df.iloc[0]["asa_abs_error_alpha_2"]
    expect = abs(
        df.iloc[0]["gt_asa_alpha_2"] - df.iloc[0]["sample_asa_alpha_2"]
    )
    np.testing.assert_allclose(got, expect, atol=1e-9)

    # Residue-group (dihedral) granularity incl. signed errors.
    for name in ("angle_error", "signed_angle_error", "sample", "gt"):
        for angle in ("phi", "psi", "omega"):
            assert f"{name}_{angle}_alpha_1" in df.columns, (name, angle)
    s = df["signed_angle_error_psi_alpha_2"]
    assert (df["angle_error_psi_alpha_2"] - s.abs()).abs().max() < 1e-9

    # RSA correlation plot was written (pearson_scatter wiring).
    assert (run_dir / "evaluation" / "rsa_correlation.png").exists()


def test_multiloop_diffusion_info(tmp_path):
    """Multi-loop runs: loop pair selection by cdr_loop_index
    (ref evaluation/evaluate_tcr.py:223-227)."""
    import pandas as pd2

    info_path = tmp_path / "diffusion_info.csv"
    pd2.DataFrame(
        {
            "pdb_name": ["x"],
            "seq": ["AAAA"],
            "chain": ["A,A,A,B,B,B"],
            "start": ["1,20,40,5,25,45"],
            "end": ["8,27,47,12,32,52"],
        }
    ).to_csv(info_path, sep="\t", index=False)
    info = tcr_eval.parse_diffusion_info(info_path, cdr_loop_index=2)
    assert info["chains"] == ["A", "B"]
    assert info["regions"] == [(40, 47), (45, 52)]
    info0 = tcr_eval.parse_diffusion_info(info_path, cdr_loop_index=0)
    assert info0["regions"] == [(1, 8), (5, 12)]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
