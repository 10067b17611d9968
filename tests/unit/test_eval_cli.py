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


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
