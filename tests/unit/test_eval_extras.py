"""Coverage for the remaining eval/data CLIs: residue_reindex, denovo_eval,
cg2all_eval (mocked converter), and the legacy monomer PDB preprocessing."""
import pathlib
import pickle
import stat
import sys

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.analysis.utils import write_prot_to_pdb
from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.experiments.utils import save_diffusion_info
from tests.unit.geom_helpers import nerf_backbone


def _write_helix_pdb(path, n=30, phi=-57.0, psi=-47.0, chains=None, shift=0.0):
    atom37, mask = nerf_backbone(n, phi=phi, psi=psi)
    atom37 = atom37 + shift
    aatype = np.zeros(n, np.int64)
    chain_index = chains if chains is not None else np.zeros(n, np.int64)
    write_prot_to_pdb(
        atom37 * mask[..., None], path, aatype=aatype,
        residue_index=np.arange(1, n + 1), chain_index=chain_index,
    )
    return atom37, mask


def test_residue_reindex_contiguous_per_chain(tmp_path):
    from framedipt_tpu.eval.residue_reindex import reindex

    n = 20
    chains = np.repeat([0, 1], n // 2)
    atom37, mask = nerf_backbone(n)
    # Author numbering: gaps and a high-start second chain.
    residx = np.concatenate([np.arange(5, 25, 2), np.arange(100, 110)])
    write_prot_to_pdb(
        atom37 * mask[..., None], tmp_path / "in", aatype=np.zeros(n, np.int64),
        residue_index=residx, chain_index=chains,
    )
    pdb_in = (tmp_path / "in_1.pdb").read_text()
    out = reindex(pdb_in)
    prot = from_pdb_string(out)
    for cid in (0, 1):
        sel = prot.chain_index == cid
        np.testing.assert_array_equal(
            prot.residue_index[sel], np.arange(1, sel.sum() + 1)
        )


def test_denovo_eval_summary(tmp_path):
    from framedipt_tpu.eval import denovo_eval

    # Two helical samples (same fold => one cluster) + sc_results fixtures.
    for s, phi in enumerate((-57.0, -57.5)):
        sdir = tmp_path / "run" / f"sample_{s}"
        sdir.mkdir(parents=True)
        _write_helix_pdb(sdir / f"sample_{s}", n=30, phi=phi)
        sc = sdir / "self_consistency"
        sc.mkdir()
        pd.DataFrame(
            {"rmsd": [0.5 + s, 3.0], "tm_score": [0.9 - 0.1 * s, 0.4]}
        ).to_csv(sc / "sc_results.csv", index=False)

    results = denovo_eval.run(tmp_path / "run")
    assert results["num_samples"] == 2
    # Near-identical helices cluster together: diversity = 1/2.
    assert results["num_clusters"] == 1
    assert results["diversity"] == pytest.approx(0.5)
    # Ideal alpha helix: overwhelmingly helical, no strand.
    assert results["helix_percent_mean"] > 0.6
    assert results["strand_percent_mean"] < 0.1
    # Designability: sample_0 best rmsd 0.5 (<2), sample_1 best 1.5 (<2).
    assert results["designable_fraction"] == 1.0
    out = tmp_path / "run" / "evaluation"
    assert (out / "denovo_summary.csv").exists()
    assert (out / "ss_composition.csv").exists()
    assert (out / "designability.csv").exists()


def _fake_inference_dir(tmp_path, n=30, region=(10, 19)):
    atom37, mask = nerf_backbone(n)
    aatype = np.zeros(n, np.int64)
    diffused = np.zeros(n)
    diffused[region[0] : region[1] + 1] = 1
    ldir = tmp_path / f"test_length_{int(diffused.sum())}"
    ldir.mkdir(parents=True)
    b = np.tile((diffused * 100.0)[:, None], (1, 37))
    write_prot_to_pdb(
        atom37 * mask[..., None], ldir / "test", aatype=aatype, b_factors=b,
        residue_index=np.arange(1, n + 1), chain_index=np.zeros(n, np.int64),
    )
    save_diffusion_info(
        ldir, "test", rc.aatype_to_sequence(aatype), diffused,
        np.zeros(n, np.int64),
    )
    sdir = ldir / "sample_0"
    sdir.mkdir()
    pos = atom37.copy()
    pos[region[0] : region[1] + 1, :, 0] += 1.0
    write_prot_to_pdb(
        pos * mask[..., None], sdir / "sample_0", aatype=aatype, b_factors=b,
        residue_index=np.arange(1, n + 1), chain_index=np.zeros(n, np.int64),
    )
    return tmp_path


def test_cg2all_eval_with_mock_converter(tmp_path, monkeypatch):
    """The cg2all CLI converts each sample via the adapter then scores
    full-atom RMSD; mock convert_cg2all copies its input."""
    import os

    from framedipt_tpu.eval import cg2all_eval

    pred = _fake_inference_dir(tmp_path / "pred")
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    mock = bin_dir / "convert_cg2all"
    mock.write_text(
        "#!" + sys.executable + "\n"
        "import sys, shutil\n"
        "kv = dict(zip(sys.argv[1::2], sys.argv[2::2]))\n"
        "assert kv['--cg'] == 'ca', sys.argv\n"
        "shutil.copy(kv['-p'], kv['-o'])\n"
    )
    mock.chmod(mock.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    df = cg2all_eval.run(pred)
    assert len(df) == 1
    # Region shifted by 1 A in x => full-atom RMSD == 1.
    assert df.iloc[0]["full_atom_rmsd"] == pytest.approx(1.0, abs=1e-3)
    assert df.iloc[0]["bb_rmsd"] == pytest.approx(1.0, abs=1e-3)
    assert "tcr_alpha_chain" in df.columns  # reference row schema
    assert (pred / "evaluation" / "cg2all_eval.csv").exists()
    # Reference naming contract: the reconstruction lands at
    # sample_{i}_1_all_atom.pdb so traverse_prediction_dir prefers it.
    all_atoms = list(pred.glob("*_length_*/sample_*/sample_*_1_all_atom.pdb"))
    assert all_atoms, "cg2all output not at the reference path"


def test_process_pdb_files_cli(tmp_path):
    from framedipt_tpu.data.process_pdb_files import process_pdb_file
    from framedipt_tpu.tools import errors

    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    _write_helix_pdb(pdb_dir / "abcd", n=64)
    out = tmp_path / "out"
    out.mkdir()
    row = process_pdb_file(pdb_dir / "abcd_1.pdb", out)
    assert row["seq_len"] == 64
    assert row["modeled_seq_len"] == 64
    assert row["helix_percent"] > 0.6
    assert row["radius_gyration"] > 0
    with open(row["processed_path"], "rb") as f:
        raw = pickle.load(f)
    assert raw["aatype"].shape == (64,)
    assert raw["atom_positions"].shape == (64, 37, 3)
    # Pickles shard by the reference's 2-char directory scheme.
    assert pathlib.Path(row["processed_path"]).parent.name == "bc"

    _write_helix_pdb(pdb_dir / "tiny", n=30)
    with pytest.raises(errors.LengthError):
        process_pdb_file(pdb_dir / "tiny_1.pdb", out, min_len=60)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
