"""End-to-end inference on real mmCIF fixtures (1fyt/5ksa/7t2d assemblies),
asserting the reference's filesystem contract (SURVEY.md §4): per-structure
length dirs with ground-truth PDB + diffusion_info.csv, per-sample dirs
with sample_{i}_1.pdb. Runs with a tiny random-weight model and num_t=2."""
import pathlib

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.experiments.inference import Inference
from framedipt_tpu.tools.config import Config, SO3Config

CIF_DIR = pathlib.Path(__file__).parent.parent / "data" / "cifs"


def tiny_inference_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.diffuser.so3 = SO3Config(num_omega=50, num_sigma=20, cache_dir=None)
    m = cfg.model
    m.node_embed_size = 32
    m.edge_embed_size = 16
    m.ipa.c_s = 32
    m.ipa.c_z = 16
    m.ipa.c_hidden = 16
    m.ipa.c_skip = 8
    m.ipa.no_heads = 2
    m.ipa.no_qk_points = 4
    m.ipa.no_v_points = 4
    m.ipa.num_blocks = 1
    m.ipa.seq_tfmr_num_layers = 1
    m.ipa.seq_tfmr_num_heads = 2
    cfg.inference.inpainting = True
    cfg.inference.inpainting_samples.tcr = False
    cfg.inference.inpainting_samples.samples = 1
    cfg.inference.diffusion.num_t = 2
    cfg.inference.weights_path = ""  # random init
    cfg.inference.output_dir = str(tmp_path / "out")
    cfg.inference.name = "itest"
    return cfg


@pytest.mark.slow
def test_conditional_inference_filesystem_contract(tmp_path):
    cfg = tiny_inference_cfg(tmp_path)
    # Keep one structure for speed; the other fixtures are covered by the
    # data-pipeline unit tests.
    cif_dir = tmp_path / "cifs"
    cif_dir.mkdir()
    (cif_dir / "1fyt-assembly1.cif").write_bytes(
        (CIF_DIR / "1fyt-assembly1.cif").read_bytes()
    )

    inference = Inference(cfg, cif_dir=cif_dir)
    inference.run_sampling()

    out = inference.output_dir
    length_dirs = list(out.glob("1fyt_length_*"))
    assert len(length_dirs) == 1, f"expected one length dir, got {length_dirs}"
    ldir = length_dirs[0]

    # Ground truth PDB with b-factor diffusion markers.
    gt = ldir / "1fyt_1.pdb"
    assert gt.exists()
    prot = from_pdb_string(gt.read_text())
    marked = prot.b_factors.max(axis=-1)
    assert set(np.unique(marked)) <= {0.0, 100.0}
    assert (marked == 100.0).sum() > 0

    # diffusion_info.csv contract.
    info = pd.read_csv(ldir / "diffusion_info.csv", sep="\t")
    assert list(info.columns) == ["pdb_name", "seq", "chain", "start", "end"]
    assert info.iloc[0]["pdb_name"] == "1fyt"

    # Sample outputs.
    sample_pdb = ldir / "sample_0" / "sample_0_1.pdb"
    assert sample_pdb.exists()
    sample_prot = from_pdb_string(sample_pdb.read_text())
    assert np.isfinite(sample_prot.atom_positions).all()
    assert (ldir / "sample_0" / "bb_traj_0_1.pdb").exists()
    assert (ldir / "sample_0" / "x0_traj_0_1.pdb").exists()

    # Fixed (non-diffused) residues keep their ground-truth CA coordinates.
    fixed_sel = marked == 0.0
    ca_gt = prot.atom_positions[fixed_sel, 1]
    ca_sample = sample_prot.atom_positions[fixed_sel, 1]
    np.testing.assert_allclose(ca_sample, ca_gt, atol=2e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
