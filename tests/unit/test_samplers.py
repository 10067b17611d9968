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


def _seed_download_dir(tmp_path):
    """Pre-populate download_dir/cifs with the bundled fixtures (the
    zero-egress stand-in for the RCSB download)."""
    cifs = tmp_path / "dl" / "cifs"
    cifs.mkdir(parents=True)
    for p in CIF_DIR.glob("*.cif"):
        (cifs / p.name).write_bytes(p.read_bytes())
    return tmp_path / "dl"


def _fixture_csv(tmp_path):
    """TCR CSV restricted to the three bundled fixture structures."""
    import pandas as pd

    csv = pd.read_csv("database/TCR_pMHC_II.csv")
    csv = csv[csv["pdb_id"].isin(["1fyt", "5ksa", "7t2d"])]
    path = tmp_path / "tcr_fixtures.csv"
    csv.to_csv(path, index=False)
    return str(path)


def test_tcr_sampler_from_database(diffuser, tmp_path, monkeypatch):
    """Database-driven init (ref experiments/sampler.py:184-226): metadata
    built with inference filters, cached, and reused."""
    download_dir = _seed_download_dir(tmp_path)
    cfg = Config()
    isc = cfg.inference.inpainting_samples
    isc.samples = 1
    isc.data_path = _fixture_csv(tmp_path)
    isc.download_dir = str(download_dir)

    calls = []
    from framedipt_tpu.data import download as download_lib

    monkeypatch.setattr(
        download_lib, "download_cifs",
        lambda ids, out, **kw: calls.append(list(ids)) or [],
    )

    sampler = TCRSampler.from_database(cfg, diffuser, seed=1)
    assert len(sampler.cif_paths) == 3
    assert not calls, "all files present: no download attempted"
    meta_path = download_dir / "processed" / "metadata.csv"
    assert meta_path.exists()
    import pandas as pd

    meta = pd.read_csv(meta_path)
    assert set(meta["pdb_name"]) == {"1fyt", "5ksa", "7t2d"}
    # Pickles written in the reference's hashed-subdir layout.
    assert (download_dir / "processed" / "fy" / "1fyt.pkl").exists()

    # Filters: a tiny chain_max_len rejects everything on a rebuild.
    isc.chain_max_len = 10
    isc.overwrite = True
    sampler2 = TCRSampler.from_database(cfg, diffuser, seed=1)
    assert len(sampler2.cif_paths) == 0

    # Cached metadata is reused when overwrite=False (filters ignored).
    isc.overwrite = False
    isc.chain_max_len = None
    sampler3 = TCRSampler.from_database(cfg, diffuser, seed=1)
    assert len(sampler3.cif_paths) == 0  # stale cache from the strict run


def test_from_database_attempts_download_of_missing(diffuser, tmp_path, monkeypatch):
    download_dir = _seed_download_dir(tmp_path)
    (download_dir / "cifs" / "5ksa-assembly1.cif").unlink()
    cfg = Config()
    isc = cfg.inference.inpainting_samples
    isc.data_path = _fixture_csv(tmp_path)
    isc.download_dir = str(download_dir)

    requested = []
    from framedipt_tpu.data import download as download_lib

    monkeypatch.setattr(
        download_lib, "download_cifs",
        lambda ids, out, **kw: requested.extend(ids) or [],
    )
    sampler = TCRSampler.from_database(cfg, diffuser, seed=1)
    assert requested == ["5ksa"]
    assert len(sampler.cif_paths) == 2  # missing one skipped gracefully


def test_pipeline_inference_filters(tmp_path):
    """ProcessOptions extensions: chain selection, per-chain modeled-length
    bounds, chain-count cap, invalid-resolution rejection
    (ref process_pdb_dataset.py:198-201,250-253,458-460)."""
    from framedipt_tpu.data.pipeline import ProcessOptions, process_mmcif
    from framedipt_tpu.tools import errors
    from framedipt_tpu.tools.config import FilteringConfig

    path = sorted(CIF_DIR.glob("1fyt*.cif"))[0]
    base = dict(
        output_dir=tmp_path,
        filtering=FilteringConfig(max_len=10**9, min_len=0),
        max_resolution=None,
        ss_filters=False,
    )
    row = process_mmcif(path, ProcessOptions(**base))
    assert row["pdb_name"] == "1fyt"

    with pytest.raises(errors.ChainError):
        process_mmcif(path, ProcessOptions(**base, max_num_chains=2))
    with pytest.raises(errors.ChainError):
        process_mmcif(path, ProcessOptions(**base, chains=["Z"]))
    with pytest.raises(errors.LengthError):
        process_mmcif(path, ProcessOptions(**base, chain_max_len=50))
    with pytest.raises(errors.LengthError):
        process_mmcif(path, ProcessOptions(**base, chain_min_len=10**6))
    # Chain selection restricts the features written.
    row_ab = process_mmcif(path, ProcessOptions(**base, chains=["D", "E"]))
    assert row_ab["num_chains"] == 2
    assert row_ab["seq_len"] < row["seq_len"]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
