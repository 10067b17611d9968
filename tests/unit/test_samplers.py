"""Sampler iterators: unconditional grid, TCR chain selection + CDR masks
on the real fixture structures."""
import pathlib

import numpy as np
import pytest

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.experiments.samplers import TCRSampler, UnconditionalSampler
from framedipt_tpu.tools.config import Config, DiffuserConfig, SO3Config

CIF_DIR = pathlib.Path(__file__).parent.parent / "data" / "cifs"
SMALL_SO3 = SO3Config(num_omega=50, num_sigma=20, cache_dir=None)


@pytest.fixture(scope="module")
def diffuser():
    return SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))


def test_unconditional_grid(diffuser):
    cfg = Config()
    cfg.inference.samples.min_length = 32
    cfg.inference.samples.max_length = 64
    cfg.inference.samples.length_step = 32
    cfg.inference.samples.samples_per_length = 2
    sampler = UnconditionalSampler(cfg, diffuser, seed=1)
    items = list(sampler)
    assert len(items) == 4
    names = {name for name, _, _ in items}
    assert names == {"length_32", "length_64"}
    _, _, feats = items[0]
    assert feats["rigids_t"].shape == (1, 32, 7)
    assert feats["fixed_mask"].sum() == 0  # fully diffused


def test_tcr_sampler_cdr3_mask(diffuser):
    cfg = Config()
    cfg.inference.inpainting_samples.samples = 1
    cfg.inference.inpainting_samples.cdr_loops = ["beta_3"]
    sampler = TCRSampler(
        cfg,
        diffuser,
        cif_dir=CIF_DIR,
        csv_path="database/TCR_pMHC_II.csv",
        seed=1,
    )
    # All three bundled pMHC-II fixtures resolve to files.
    assert len(sampler.cif_paths) == 3
    pdb_name, sample_idx, feats = sampler[0]
    assert sample_idx == 0
    fixed = feats["fixed_mask"][0]
    res = feats["res_mask"][0]
    diffused = (1 - fixed) * res
    n_diffused = int(diffused.sum())
    # CDR3 is masked in BOTH TCR chains (reference semantics,
    # framedipt/protein/tcr.py:108): two contiguous loops of ~8-15 residues.
    assert 12 <= n_diffused <= 40, n_diffused
    rows = np.where(diffused > 0)[0]
    gaps = np.where(np.diff(rows) > 1)[0]
    assert len(gaps) == 1, "expected exactly two CDR3 regions (alpha + beta)"
    chain_of_mask = sorted(np.unique(feats["chain_idx"][0][rows]))
    assert chain_of_mask == [0, 1], "one CDR3 per TCR chain"
    # Fixed region imputed from ground truth (t=1 reference sampling).
    np.testing.assert_allclose(
        feats["rigids_t"][0][fixed.astype(bool) & res.astype(bool)][:, 4:],
        feats["rigids_0"][0][fixed.astype(bool) & res.astype(bool)][:, 4:],
        atol=1e-4,
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
